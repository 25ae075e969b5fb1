# -*- coding: utf-8 -*-
V='்'
VALL=set('கசடதபற')
SIGNS8=set('ிாைேெூுீ')
IEI=set('ிைீ')
CONS=set('கஙசஜஞடணதநனபமயரறலளழவஶஷஸஹ')
TAM18=set('கஙசஞடணதநனபமயரறலளழவ')
VOW=set('அஆஇஈஉஊஎஏஐஒஓஔஃ')
LET=CONS|VOW
PREF_C=set('கசதவநபமயஙஞ')

class W:
    __slots__=('c','vflag')
    def __init__(s,w): s.c=list(w); s.vflag=False
    def __str__(s): return ''.join(s.c)

def rep(w,n):
    del w.c[-n:]
    if w.c: w.c.append(V)

def fix_ending_once(w,mode='x'):
    c=w.c
    if len(c)<=3: return False
    if mode in ('psup','plural') and len(c)<=4: return False
    s=''.join(c)
    def e(x): return s.endswith(x)
    if e('ந'+V+'த'+V): del c[-4:]; return True
    if e('ந'+V+'த'): del c[-3:]; return True
    if e('ந'+V): del c[-2:]; return True
    if e('ய'+V) and len(c)>=3 and c[-3] in IEI: del c[-2:]; return True
    if e('த'+V+'த'+V):
        if w.vflag and len(c)>=5 and c[-5] not in ('ை','ா',V):
            del c[-4:]; c.extend(['ம',V])
        else: del c[-4:]
        return True
    if e('ட'+V+'ட'+V): del c[-4:]; c.extend(['ட','ு']); return True
    if e('ட'+V+'ப'+V) or e('ட'+V+'க'+V):
        del c[-4:]; c.extend(['ள',V]); return True
    if e('ன'+V+'ற'+V) or e('ற'+V+'க'+V):
        del c[-4:]; c.extend(['ல',V]); return True
    if e('ுக'+V+'க'+V): del c[-5:]; c.append(V); return True
    if e('ுக'+V): del c[-3:]; c.append(V); return True
    if e('ுங'+V): del c[-3:]; c.append(V); return True
    if e('த'+V+'த'+'ு'): del c[-4:]; return True
    if mode in ('common','vet','tense','plural','command') and e('ட'+'ும'+V): rep(w,4); return True  # not in hard/psup/initial/q/um
    if mode in ('common','vet','tense','plural','command'):
        for cc in ('த','க','ற'):
            if e(cc+'ும'+V): del c[-4:]; return True
    if len(c)>=3 and c[-1]==V and c[-2] in TAM18 and c[-3]==V: del c[-2:]; return True
    if len(c)>=2 and c[-1]==V and c[-2] in VALL: del c[-2:]; return True
    if e('ங'+V):
        if len(c)>=3 and c[-3]=='ை': del c[-2:]
        else: del c[-2:]; c.extend(['ம',V])
        return True
    if e('வ'+V): del c[-2:]; return True
    if c[-1]==V and len(c)>=3 and c[-2]==V and c[-3] in CONS: del c[-1:]; return True
    if c[-1]==V and len(c)>=2 and c[-2] in SIGNS8: del c[-1:]; return True
    if mode=='initial' and e('னு') and (len(c)<3 or c[-3] not in SIGNS8): del c[-2:]; return True
    if mode in ('initial','vet','tense') and c[-1]=='ய': del c[-1:]; return True
    if mode in ('initial','vet','tense') and c[-1]=='வ': del c[-1:]; return True
    return False

def fix_endings(w,mode='x'):
    while fix_ending_once(w,mode=mode): pass

def fix_va_start(w):
    s=''.join(w.c[:2])
    m={'வோ':'ஓ','வொ':'ஒ','வு':'உ','வூ':'ஊ'}
    if s in m: w.c[:2]=[m[s]]

def ai_cond(c,k):
    i=len(c)-k-1
    if i<0: return True
    if c[i]=='ன': return False
    if c[i] not in VALL: return True
    return i>=1 and c[i-1]==V

COMMON_P=['ுடன'+V,'ில'+V+'லை','ின'+V+'றி','ாகிய','ாகி','ுள'+V+'ள','ுடைய','ல'+V+'ல','ென'+V+'று','ிடம'+V]
COMMON_D=['விட'+V+'டு','விடு','பட'+V+'டது','பட'+V+'டண','பட'+V+'டு','பட'+V+'ட','பற'+V+'றி','படி','ெல'+V+'லாம'+V]
# vetrumai: (suffix, mode) mode: 0=rep 1=rep+ai_cond 2=rep+prev-LET 3=delete
VET=[('ாமல'+V,0),('மின'+V,3),('கண'+V,3),('முன'+V,3),('மேல'+V,3),('மேற'+V,3),('கீழ'+V,3),('பின'+V,3),('ிருந'+V+'து',0),('ின'+V+'று',0),('ால'+V,0),('ில'+V,0),('ின'+V,0),('ொடு',0),('ோடு',0),('ுடை',0),('ுள'+V,0),('விட',0),('ல'+V,2),('ை',1)]
# tense rules: (suffix, action, cond, aux)
# action: d=del v=rep aa=special k=kira-style  cond: vq(prev='), t8(prev not in SIGNS8)
TENSE=[]
def T(s,a,c=None,aux=False): TENSE.append((s,a,c,aux))
T('கொண'+V+'டிர'+V,'d'); T('தான','d',aux=True); T('படு','d',aux=True)
T('மின'+V,'d'); T('மார'+V,'d'); T('னென'+V,'d')
for x in ['னான'+V,'னாள'+V,'னார'+V,'னன'+V,'வள'+V,'னர'+V,'னள'+V,'பன'+V,'பள'+V,'பர'+V,'னம'+V,'பம'+V]: T(x,'d')
T('வன'+V,'d','nvow')
T('னை','d'); T('வர'+V,'d')
T('கு','d','vq'); T('ிற'+V+'று','d')
T('து','d','t8',aux=True); T('னு','d','t8')
for k in ['ாநின'+V+'ற','கின'+V+'ற','கிற']: T(k,'k')
for p in ['ான'+V,'ாள'+V,'ார'+V,'ேன'+V,'ோம'+V,'ேம'+V,'ெம'+V,'ாம'+V,'ாய'+V,'ீயர'+V,'ீர'+V,'னிர'+V]: T(p,'v')
T('ென','v','en2',aux=True)
T('வை','d')
T('ா','aa')
for ssg in ['ன','த','க','ப','ய','வ']: T(ssg,'d')
KIRA=['நின'+V+'ற'+V,'கின'+V+'ற'+V,'கிற'+V]
CLAUSE=[(cc+'ும'+V,'cum') for cc in ['க','த','ட','ற']]
CLAUSE+= [('ிருந'+V+'து','vet'),('ின'+V+'று','vet'),('ால'+V,'vet'),('ில'+V,'vet'),('ின'+V,'vet'),('ொடு','vet'),('ோடு','vet'),('ுடை','vet'),('ுள'+V,'vet'),('விட','vet'),('ிடம'+V,'vet'),('ல'+V,'vet')]
CLAUSE+= [('ட'+V+'கள'+V,'tkal'),('ற'+V+'கள'+V,'rkal'),('கள'+V,'kal'),('வ'+'ீ','vii'),('கண'+V,'pp'),('முன'+V,'pp'),('மேல'+V,'pp'),('மேற'+V,'pp'),('கீழ'+V,'pp'),('பின'+V,'pp')]
CLAUSE+= [('னை','nai'),('ை','ai'),('ீ','ii')]

def stem(word):
    w=W(word)
    fix_ending_once(w,mode='initial')
    if len(w.c)<=4: return str(w)
    if len(w.c)>=3 and w.c[0]=='எ' and w.c[1] in PREF_C and w.c[2]==V:
        del w.c[:3]; fix_va_start(w)
    if len(w.c)>=3 and w.c[0] in ('அ','இ','உ') and w.c[1] in PREF_C and w.c[2]==V:
        del w.c[:3]; fix_va_start(w)
    if len(w.c)>4:
        if w.c[-1] in ('ோ','ே','ா'): w.c[-1]=V
        fix_endings(w,mode='q')
    if len(w.c)>4:
        if ''.join(w.c[-3:])=='ும'+V: rep(w,3); fix_endings(w,mode='um')
    if len(w.c)>4:
        s=''.join(w.c); m=None
        for suf in COMMON_P:
            if not s.endswith(suf): continue
            if suf=='ல'+V+'ல' and (len(w.c)>3 and w.c[-4] in SIGNS8): continue
            if m is None or len(suf)>len(m[0]): m=(suf,'p')
        for suf in COMMON_D:
            if s.endswith(suf) and (m is None or len(suf)>len(m[0])): m=(suf,'d')
        if m:
            if m[1]=='p': rep(w,len(m[0]))
            else: del w.c[-len(m[0]):]
        fix_endings(w,mode='common')
        if len(w.c)>4:
            if ''.join(w.c[-2:])=='வ'+'ீ': del w.c[-2:]
            elif w.c[-1]=='ீ': w.c[-1]='ி'
    if len(w.c)>4 and ''.join(w.c[-3:])=='ுடை':
        rep(w,3); w.vflag=True
        fix_endings(w,mode='vet')
    if len(w.c)>4:
        s=''.join(w.c); m=None
        for suf,mode in VET:
            if not s.endswith(suf): continue
            if mode==1 and not ai_cond(w.c,len(suf)): continue
            if mode==2 and (len(w.c)>len(suf) and w.c[-len(suf)-1] in SIGNS8): continue
            if m is None or len(suf)>len(m[0]): m=(suf,mode)
        if m:
            if m[1]==3: del w.c[-len(m[0]):]
            else: rep(w,len(m[0]))
            w.vflag=True
            fix_endings(w,mode='vet')
    suppress=False; hardfix=False
    if len(w.c)>2:
        s=''.join(w.c); matched=False
        if s.endswith('ுங'+V+'கள'+V):
            i=len(s)-7
            del w.c[-6:]
            if i>=0 and s[i] in VALL: w.c.extend(['ு','ம',V])
            elif w.c: w.c.append(V)
            matched=True; suppress=True
        elif s.endswith('ங'+V+'கள'+V):
            del w.c[-3:]
            matched=True; suppress=True
        elif s.endswith('ட'+V+'கள'+V):
            del w.c[-5:]
            if w.c and w.c[-1]==V: suppress=True; hardfix=True
            w.c.extend(['ள',V])
            matched=True
        elif s.endswith('ற'+V+'கள'+V):
            del w.c[-5:]
            if w.c and w.c[-1]==V: suppress=True; hardfix=True
            w.c.extend(['ல',V])
            matched=True
        elif s.endswith('கள'+V): del w.c[-3:]; matched=True
        if matched: fix_endings(w,mode=('hard' if hardfix else 'psup') if suppress else 'plural')
    if len(w.c)>4 and not suppress:
        s=''.join(w.c)
        if s.endswith('ுக'+V+'கு'):
            rep(w,5); fix_endings(w,mode='command')
        elif s.endswith('பி') or s.endswith('வி'):
            del w.c[-2:]; fix_endings(w,mode='command')
    if not suppress:
        tense(w)
    return str(w)

def tense(w):
    loop=True; first=True
    while loop:
        loop=False
        if len(w.c)<=4: break
        s=''.join(w.c); best=None
        for (suf,act,cond,aux) in TENSE:
            if not s.endswith(suf): continue
            i=len(w.c)-len(suf)-1
            if cond=='vq' and (i<0 or w.c[i]!=V): continue
            if cond=='t8' and (i>=0 and w.c[i] in SIGNS8): continue
            if cond=='am2' and (i>=1 and w.c[i-1]==V): continue
            if cond=='plet' and not (i>=0 and w.c[i] in LET): continue
            if cond=='en2' and (i>=1 and w.c[i-1]==V): continue
            if cond=='nvow' and (i>=0 and w.c[i] in VOW): continue
            if best is None or len(suf)>len(best[0]): best=(suf,act,cond,aux)
        if not best: break
        suf,act,cond,aux=best
        if act=='aa':
            if len(w.c)>=2 and w.c[-2] in SIGNS8: del w.c[-1:]
            else: rep(w,1)
            loop=True
        elif act=='k':
            del w.c[-len(suf):]; loop=True
        elif act=='v':
            rep(w,len(suf)); loop=True
        else:
            del w.c[-len(suf):]
            if cond!='weak': loop=True
        if aux and first and (not w.vflag) and ''.join(w.c[-3:])=='படி':
            del w.c[-3:]
        first=False
        if aux and len(w.c)>4:
            s2=''.join(w.c); cl=None
            for (cs,kind) in CLAUSE:
                if not s2.endswith(cs): continue
                i=len(w.c)-len(cs)-1
                if kind=='cum' and (i<0 or w.c[i]!=V): continue
                if kind=='vet' and cs[0] in SIGNS8 and (i>=0 and w.c[i] in SIGNS8): continue
                if kind=='padi' and w.vflag: continue
                if kind=='ai' and not ai_cond(w.c,1): continue
                if cl is None or len(cs)>len(cl[0]): cl=(cs,kind)
            if cl:
                cs,kind=cl
                if kind=='cum': rep(w,4)
                elif kind=='tkal':
                    del w.c[-5:]
                    if w.c and w.c[-1]!=V: w.c.extend(['ள',V])
                elif kind=='rkal':
                    del w.c[-5:]
                    if w.c and w.c[-1]!=V: w.c.extend(['ல',V])
                elif kind=='kal': del w.c[-3:]
                elif kind=='vii': del w.c[-2:]
                elif kind=='padi': del w.c[-3:]
                elif kind=='pp': del w.c[-len(cs):]
                elif kind=='nai': del w.c[-2:]
                elif kind=='ai': rep(w,1); w.vflag=True
                elif kind=='ii': w.c[-1]='ி'
                else: rep(w,len(cs)); w.vflag=True
        s2=''.join(w.c)
        for k in KIRA:
            if s2.endswith(k): del w.c[-len(k):]; break
        fix_endings(w,mode='tense')
