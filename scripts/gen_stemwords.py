#!/usr/bin/env python3
"""Deterministic probe-word generator for stemmer parity testing.

For each language, emits: (a) inflection grids (common stems x suffix
inventories), (b) random strings over the language alphabet biased toward
suffix-like endings, (c) a small set of real words. Vectors are stemmed by
scripts/sb_oracle.py (system libstemmer) to form golden files.
"""
import random, sys, unicodedata, pathlib

OUT = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/stemwords")
OUT.mkdir(parents=True, exist_ok=True)

def grid(stems, sufs, also_bare=True):
    out = set()
    for s in stems:
        if also_bare: out.add(s)
        for x in sufs:
            out.add(s + x)
    return out

def rand_words(alpha, endings, n, seed, minl=3, maxl=14):
    rnd = random.Random(seed)
    out = set()
    while len(out) < n:
        L = rnd.randint(minl, maxl)
        w = "".join(rnd.choice(alpha) for _ in range(L))
        if endings and rnd.random() < 0.6:
            w = w[: max(1, L - len(endings[0]))] + rnd.choice(endings)
        out.add(w)
    return out

LANGS = {}

# ---------------- Turkish ----------------
tr_stems = ["ev", "kitap", "kitab", "araba", "göz", "gül", "okul", "tür",
            "çocuk", "kapı", "gün", "yol", "el", "baş", "su", "köy", "şehir",
            "adam", "kadın", "sokak", "sevgi", "bilgisayar", "üniversite",
            "öğrenci", "arkadaş", "dost", "yer", "zaman", "anne", "baba"]
tr_sufs = ["lar", "ler", "ları", "leri", "larından", "lerinden", "da", "de",
           "ta", "te", "dan", "den", "tan", "ten", "ın", "in", "un", "ün",
           "ım", "im", "um", "üm", "ımız", "imiz", "umuz", "ümüz", "ınız",
           "iniz", "unuz", "ünüz", "sı", "si", "su", "sü", "ya", "ye", "yı",
           "yi", "yu", "yü", "nın", "nin", "nun", "nün", "na", "ne", "nda",
           "nde", "ndan", "nden", "yla", "yle", "ile", "ki", "deki", "daki",
           "dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür", "mış",
           "miş", "muş", "müş", "mıştı", "mişti", "sın", "sin", "sun", "sün",
           "sınız", "siniz", "ız", "iz", "uz", "üz", "dı", "di", "du", "dü",
           "ydı", "ydi", "ydu", "ydü", "yken", "ken", "casına", "cesine",
           "sa", "se", "ysa", "yse", "ymış", "ymiş", "larıyla", "leriyle",
           "ları", "leri", "ına", "ine", "ını", "ini", "ından", "inden",
           "lık", "lik", "luk", "lük", "cı", "ci", "cu", "cü", "çı", "çi"]
tr = grid(tr_stems, tr_sufs)
tr |= {"evlerinden", "kitabı", "arabalarımızdan", "gözlerinizin", "türkiyedir",
       "gittikçe", "koşacaksınız", "üzerinde", "değildir", "kalemiyle",
       "okuduklarımızdan", "taksicilik", "güzelliğin", "soruşturma",
       "bulamıyorum", "defterlerimizdekiler", "anlattıklarından"}
tr |= rand_words("abcçdefgğhıijklmnoöprsştuüvyz", tr_sufs, 2500, 101)
LANGS["turkish"] = tr

# ---------------- Romanian ----------------
ro_stems = ["lucr", "carte", "cărț", "frumos", "frumoas", "copil", "om",
            "cas", "fat", "băiat", "munc", "viaț", "țar", "oraș", "timp",
            "durer", "iubir", "român", "limb", "cuvânt", "noapte", "zi"]
ro_sufs = ["ul", "ului", "uri", "urile", "urilor", "ile", "ilor", "ele",
           "elor", "ea", "eaua", "a", "ei", "ii", "iei", "atoare", "ator",
           "atori", "ătoare", "ător", "ători", "abil", "abila", "abilă",
           "abile", "abili", "ibil", "oasă", "oasa", "oase", "os", "oși",
           "osi", "itate", "itati", "ităţi", "ivă", "iva", "ive", "ivi",
           "iv", "ică", "ica", "ice", "ici", "ic", "are", "ere", "ire",
           "âre", "ind", "ând", "indu", "ându", "eze", "ească", "ez",
           "ezi", "ează", "esc", "ești", "eşti", "este", "aște", "ește",
           "ăsc", "im", "îm", "ați", "aţi", "em", "am", "au", "eau", "iau",
           "ui", "âi", "ăi", "ase", "ise", "âse", "use", "at", "ată",
           "ate", "ați", "it", "ită", "ite", "iți", "ut", "ută", "ute",
           "uți", "ând", "ești", "ilor", "ioasă"]
ro = grid(ro_stems, ro_sufs)
ro |= {"lucrurile", "cărțile", "frumoasă", "copiii", "muncitorii",
       "românească", "întotdeauna", "câteodată", "niciodată", "importantă",
       "națională", "internațională", "dezvoltarea", "posibilitatea",
       "activităţile", "generaţie", "acţiune", "şcoală", "ştiinţă"}
ro |= rand_words("aăâbcdefghiîjlmnopqrsșştțţuvxz", ro_sufs, 2500, 102)
LANGS["romanian"] = ro

# ---------------- Hungarian ----------------
hu_stems = ["ház", "kert", "asztal", "ember", "gyerek", "város", "ország",
            "könyv", "szó", "kéz", "láb", "fej", "nap", "év", "idő", "munka",
            "munk", "iskola", "iskol", "barát", "szeretet", "szép", "nagy",
            "magyar", "tanár", "diák", "utca", "ajtó", "ablak"]
hu_sufs = ["ok", "ek", "ök", "ak", "t", "ot", "et", "öt", "at", "ban", "ben",
           "ba", "be", "ból", "ből", "nak", "nek", "val", "vel", "ra", "re",
           "ról", "ről", "tól", "től", "on", "en", "ön", "n", "hoz", "hez",
           "höz", "ig", "ért", "vá", "vé", "kor", "ul", "ül", "an", "en",
           "képp", "képpen", "lag", "leg", "nál", "nél", "ó", "ő", "va",
           "ve", "ván", "vén", "am", "em", "om", "öm", "ad", "ed", "od",
           "öd", "a", "e", "ja", "je", "unk", "ünk", "juk", "jük", "uk",
           "ük", "átok", "étek", "tok", "tek", "tök", "aim", "eim", "aid",
           "eid", "ai", "ei", "aink", "eink", "aitok", "eitek", "aik",
           "eik", "é", "éi", "ké", "abb", "ebb", "obb", "ság", "ség",
           "sága", "sége", "i", "ás", "és", "ása", "ése", "ást", "ést",
           "ások", "ések", "asszon", "esszen"]
hu = grid(hu_stems, hu_sufs)
hu |= {"házakban", "legnagyobb", "szeretetét", "gyerekeknek", "városokból",
       "könyveimet", "barátaimmal", "magyarországon", "legszebb",
       "leggyorsabban", "tanárainknak", "fiaiéi", "babakocsi", "háztól"}
hu |= rand_words("aábcdeéfghiíjklmnoóöőprstuúüűvyz", hu_sufs, 2500, 103)
LANGS["hungarian"] = hu

# ---------------- Greek ----------------
gr_stems = ["βιβλι", "άνθρωπ", "παιδ", "γυναικ", "άντρ", "σπίτ", "πόλ",
            "δρόμ", "θάλασσ", "ουραν", "αγάπ", "ζω", "χρόν", "μέρ", "νύχτ",
            "δουλει", "σχολεί", "δάσκαλ", "μαθητ", "φίλ", "καλ", "μεγάλ",
            "μικρ", "όμορφ", "ελληνικ"]
gr_sufs = ["ος", "ου", "ο", "ε", "οι", "ων", "ους", "α", "ας", "ες", "η",
           "ης", "ι", "ια", "ιου", "ιων", "μα", "ματα", "ματος", "ματων",
           "ση", "σης", "σεις", "σεων", "τητα", "τητας", "τητες", "ισμος",
           "ισμου", "ισμοι", "ισμων", "ακι", "ακια", "ιτσα", "ουλα",
           "ευω", "ευεις", "ευει", "ευουμε", "ευετε", "ευουν", "ωνω",
           "ωνεις", "ωνει", "ιζω", "ιζεις", "ιζει", "ιζουμε", "ιζετε",
           "ιζουν", "ησα", "ησες", "ησε", "ησαμε", "ησατε", "ησαν",
           "ουσα", "ουσες", "ουσε", "ουσαμε", "ουσατε", "ουσαν", "ονταν",
           "ομουν", "οσουν", "ομαστε", "οσαστε", "ηκα", "ηκες", "ηκε",
           "θηκα", "θηκες", "θηκε", "θηκαμε", "θηκατε", "θηκαν", "μενος",
           "μενη", "μενο", "μενοι", "μενες", "μενα", "οντας", "ωντας",
           "ότερος", "ότερη", "ότερο", "ότατος", "ότατη", "ότατο"]
gr = grid(gr_stems, gr_sufs)
gr |= {"βιβλία", "άνθρωποι", "παιδιά", "γυναίκες", "θάλασσες", "αγαπημένος",
       "δουλεύοντας", "ελληνικός", "μεγαλύτερος", "ομορφότατη", "παίζουμε",
       "τραγουδήσαμε", "διαβάζοντας", "γράφτηκε", "αγαπιόμαστε"}
gr |= rand_words("αβγδεζηθικλμνξοπρστυφχψωάέήίόύώς", gr_sufs, 2500, 104)
LANGS["greek"] = gr

# ---------------- Arabic ----------------
ar_stems = ["كتب", "درس", "علم", "عمل", "قلب", "بيت", "مدرس", "طالب",
            "صديق", "مدين", "بلد", "شمس", "قمر", "بحر", "جبل", "ولد",
            "بنت", "رجل", "امرأ", "طفل", "كبير", "صغير", "جميل"]
ar_pre = ["ال", "وال", "بال", "كال", "فال", "لل", "و", "ف", "ب", "ك", "ل",
          "وب", "ول", "سي", "ست", "سن", "سأ", "ي", "ت", "ن", "أ", "م"]
ar_suf = ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "كما", "هما", "تما",
          "نا", "كم", "هم", "هن", "كن", "ا", "ن", "ي", "ه", "ك", "ت",
          "تم", "تن", "وا", "تا", "ة", "ية"]
ar = set()
for s in ar_stems:
    ar.add(s)
    for p in ar_pre[:12]:
        ar.add(p + s)
    for x in ar_suf:
        ar.add(s + x)
    for p in ["ال", "وال", "و", "ب"]:
        for x in ["ها", "ات", "ون", "ين", "هم", "ة"]:
            ar.add(p + s + x)
ar |= {"كتابها", "المدرسة", "والطلاب", "يكتبون", "سيعملون", "مكتبات",
       "استعمال", "الجمهورية", "العربية", "المتحدة", "تعليمية"}
ar |= rand_words("ابتثجحخدذرزسشصضطظعغفقكلمنهوي", ar_suf, 2000, 105)
LANGS["arabic"] = ar

# ---------------- Tamil ----------------
ta_stems = ["புத்தக", "வீடு", "மரம்", "பள்ளி", "நகர", "கடல்", "மலை",
            "பூ", "நாய்", "பசு", "மனித", "குழந்தை", "தமிழ", "பாட",
            "வேலை", "கதை", "பேச்சு", "எழுத்து"]
ta_suf = ["ங்கள்", "கள்", "இன்", "உடன்", "ஓடு", "இல்", "உக்கு", "ஐ",
          "ஆல்", "உம்", "ும்", "ிலிருந்து", "க்கு", "கின்ற", "கிறது",
          "கிறான்", "கிறாள்", "கிறார்கள்", "த்தில்", "த்தை", "த்துக்கு",
          "ந்த", "ந்து", "ிய", "ான", "ாக", " என்று"]
ta = set(ta_stems)
for s in ta_stems:
    for x in ta_suf:
        ta.add(s + x.strip())
ta |= {"புத்தகங்கள்", "வீடுகளில்", "மரங்களின்", "படித்தான்", "வந்தார்கள்",
       "சென்றனர்", "பேசுகிறோம்", "எழுதியது", "தமிழில்", "பாடல்களை"}
ta |= rand_words("அஆइஇஈउஉஎஏஐஒஓகஙசஞடணதநபமயரலவழளறனசிகிடிமிலிகுடுமுலு", [], 800, 106, minl=2, maxl=8)
LANGS["tamil"] = ta

# -------- Latin-script langs: validate the 11 'done' ones too ------------
eu = {
 "danish":  ("abcdefghijklmnopqrstuvwxyzæøå", ["ede","ende","erne","eren","erens","ethed","heden","erne","et","en","er","e","es","s","hed","eret","elig","els","løst","bar"]),
 "norwegian": ("abcdefghijklmnopqrstuvwxyzæøå", ["ede","ande","ende","ane","ene","hetene","heten","heter","et","en","ar","er","as","es","leg","eleg","ets","hetens","s"]),
 "swedish": ("abcdefghijklmnopqrstuvwxyzåäö", ["arna","erna","orna","ad","ade","ande","arne","are","aste","aren","heten","heter","or","ar","er","et","en","igt","fullt","löst","s"]),
 "dutch":   ("abcdefghijklmnopqrstuvwxyzë", ["heden","ene","en","se","s","e","end","end","ig","ing","lijk","baar","bar","tje","je"]),
 "french":  ("abcdefghijklmnopqrstuvwxyzéèêëàâçîïôûù", ["ance","iqUe","isme","able","iste","eux","ances","ements","ement","ité","ités","if","ive","eaux","aux","euse","euses","issement","amment","emment","ments","ais","ait","aient","erions","erons","eront","assent","iez","ons","ant","ante","ée","és","ées","er","ez","ât","it","ie","ir","is"]),
 "spanish": ("abcdefghijklmnopqrstuvwxyzñáéíóúü", ["anzas","icos","ismos","ables","istas","osos","amientos","imientos","adora","ación","antes","ancias","mente","idades","ivas","aríamos","iésemos","áramos","ando","iendo","ado","ido","ría","rían","aba","ase","ara","ar","er","ir","os","as","es","ces"]),
 "italian": ("abcdefghijklmnopqrstuvwxyzàèéìòù", ["amenti","imenti","amento","imento","azione","azioni","atore","atori","logia","logie","mente","ità","ivo","ivi","iva","ive","ando","endo","ato","ata","ati","ate","uto","ava","erò","erà","iamo","iate","ano","are","ere","ire","erebbe"]),
 "portuguese": ("abcdefghijklmnopqrstuvwxyzáàâãçéêíóôõú", ["amentos","imentos","amento","imento","adora","ação","ações","ante","ância","mente","idade","ivas","ivos","aríamos","ássemos","êssemos","ando","endo","indo","ado","ido","ará","aria","ava","asse","ar","er","ir","os","as","es","ção"]),
 "russian": ("абвгдежзийклмнопрстуфхцчшщъыьэюя", ["ивши","ывши","ующи","ем","нн","вши","ющи","ещ","ми","ами","ями","ого","его","ому","ему","ых","их","ую","юю","ая","яя","ость","ости","ейше","ейш","ет","ют","ят","ил","ыл","им","ым","ан","ян","ова","ева","сь","ся","ей","ой","ам","ям","ах","ях","ы","и","а","я","о","у"]),
 "english": ("abcdefghijklmnopqrstuvwxyz", ["ational","tional","enci","anci","izer","ization","ation","ator","alism","iveness","fulness","ousness","aliti","iviti","biliti","icate","ative","alize","iciti","ical","ful","ness","ing","ed","edly","ingly","es","s","ies","ly","ment","ements"]),
 "german":  ("abcdefghijklmnopqrstuvwxyzäöüß", ["ern","em","er","en","es","e","s","est","st","ung","heit","keit","lich","isch","ig","end","ende"]),
}
for lang, (alpha, sufs) in eu.items():
    LANGS[lang] = rand_words(alpha, sufs, 3000, hash(lang) % 10000)

# append deunicode-style ASCII transliterations for the default-normalization path
def translit(w):
    # approximate deunicode for Latin scripts (the tokenizer's real translit
    # is its own; these are just extra ASCII probe words)
    s = unicodedata.normalize("NFKD", w)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = (s.replace("ß", "ss").replace("æ", "ae").replace("ø", "o")
           .replace("ı", "i").replace("đ", "d").replace("þ", "th"))
    return s if all(ord(c) < 128 for c in s) else None

for lang in ["turkish", "romanian", "hungarian"]:
    extra = set()
    for w in list(LANGS[lang]):
        t = translit(w)
        if t and t != w:
            extra.add(t)
    LANGS[lang] |= extra

for lang, words in LANGS.items():
    p = OUT / f"{lang}.txt"
    p.write_text("\n".join(sorted(words)) + "\n", encoding="utf-8")
    print(lang, len(words))
