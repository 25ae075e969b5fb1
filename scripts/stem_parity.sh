#!/bin/bash
# Compare graft stemmers vs system libstemmer on the generated probe lists.
# Usage: stem_parity.sh <lang> [<lang>...]   (expects /tmp/stemwords/<lang>.txt
# and compiled classes in target/scala-2.13/classes)
set -u
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
for lang in "$@"; do
  w=/tmp/stemwords/$lang.txt
  python3 /root/repo/scripts/sb_oracle.py "$lang" < "$w" > /tmp/stemwords/$lang.oracle
  java -cp "$CP" graft.tools.StemDump "$lang" "$w" /tmp/stemwords/$lang.ours 2>/dev/null
  n=$(wc -l < "$w")
  m=$(diff <(cat /tmp/stemwords/$lang.oracle) <(cat /tmp/stemwords/$lang.ours) | grep -c '^<')
  echo "$lang: $m / $n mismatches"
done
