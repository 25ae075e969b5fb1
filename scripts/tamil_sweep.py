#!/usr/bin/env python3
"""Tamil adversarial stemmer-parity sweep.

Generates random Tamil-script words biased toward suffix fragments
harvested from the probe corpus (same recipe as scripts/stem_sweep.py),
stems them with the system libstemmer oracle and the repo's TamilStemmer,
and reports mismatches grouped by oracle-stem tail so residue classes are
visible.

Usage: tamil_sweep.py [n] [seed]
Requires compiled classes in target/scala-2.13/classes and
/tmp/stemwords/tamil.txt (scripts/gen_stemwords.py).
"""
import collections, pathlib, random, subprocess, sys

REPO = pathlib.Path(__file__).resolve().parent.parent
CORP = pathlib.Path("/tmp/stemwords/tamil.txt")
OUT = pathlib.Path("/tmp/tamil_sweep")
OUT.mkdir(exist_ok=True)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4242

words = [l.strip().split("\t")[0] for l in open(CORP, encoding="utf-8") if l.strip()]
alpha = sorted(set(c for w in words for c in w))
ends = collections.Counter()
for w in words:
    for k in (1, 2, 3, 4, 5, 6):
        if len(w) > k:
            ends[w[-k:]] += 1
endings = [e for e, _ in ends.most_common(400)]
rnd = random.Random(seed)
gen = set()
while len(gen) < n:
    L = rnd.randint(2, 16)
    w = "".join(rnd.choice(alpha) for _ in range(L))
    if rnd.random() < 0.7:
        e = rnd.choice(endings)
        w = w[: max(1, L - len(e))] + e
    if rnd.random() < 0.3:  # stack a second suffix fragment
        w += rnd.choice(endings)
    gen.add(w)
gen = sorted(gen)

wf = OUT / "words.txt"
wf.write_text("\n".join(gen) + "\n", encoding="utf-8")

oracle = subprocess.run(
    ["python3", str(REPO / "scripts/sb_oracle.py"), "tamil"],
    stdin=open(wf), capture_output=True, text=True, check=True).stdout
(OUT / "oracle.tsv").write_text(oracle, encoding="utf-8")

cp = str(REPO / "target/scala-2.13/classes") + ":" + subprocess.run(
    ["bash", "-c", "ls /opt/spark/jars/*.jar | tr '\\n' ':'"],
    capture_output=True, text=True).stdout
subprocess.run(["java", "-cp", cp, "graft.tools.StemDump", "tamil",
                str(wf), str(OUT / "ours.tsv")], check=True,
               stderr=subprocess.DEVNULL)

om = dict(l.split("\t") for l in oracle.splitlines())
um = dict(l.split("\t") for l in
          open(OUT / "ours.tsv", encoding="utf-8").read().splitlines())
mism = [(w, om[w], um.get(w, "?")) for w in gen if om[w] != um.get(w, "?")]
print(f"tamil sweep: {len(mism)} / {len(gen)} mismatches (seed={seed})")
cls = collections.Counter()
for w, o, u in mism:
    cls[(w[-3:], o[-2:] if o else "", u[-2:] if u else "")] += 1
with open(OUT / "mismatches.tsv", "w", encoding="utf-8") as f:
    for w, o, u in mism:
        f.write(f"{w}\t{o}\t{u}\n")
for (tail, ot, ut), c in cls.most_common(25):
    print(f"  {c:5d}  word…{tail!r} oracle…{ot!r} ours…{ut!r}")
