"""End-metric harness: within-complex pose Spearman + cross-complex
max-fitness Spearman vs golden PhScore1, for scorer variants."""
import glob, math, sys
import numpy as np
from scipy.stats import spearmanr
from scipy.optimize import linear_sum_assignment
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.pharmacophore_rules import ligand_phore_features
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
TYPES=["MB","HD","AR","PO","HA","HY","NE","CV","CR","XB","EX"]
W=dict(zip(TYPES,[1.5,1.2,1.0,1.5,1.2,0.5,1.5,1.0,1.0,1.0,1.0]))
AL=dict(zip(TYPES,[1.0,1.0,0.7,1.0,1.0,0.7,1.0,1.0,0.7,1.0,0.837]))
K=2.41798725037
VDW={1:1.2,5:1.92,6:1.7,7:1.55,8:1.52,9:1.47,14:2.1,15:1.8,16:1.8,17:1.75,35:1.85,53:1.98}

ex=[f for f in PH.all_points if f.type=="EX"]
exc=np.array([f.coord for f in ex]); exa=np.array([f.alpha for f in ex]); exw=np.array([f.weight for f in ex])
feats=PH.features
V_ref=sum(f.weight*8*(math.pi/(2*f.alpha))**1.5 for f in feats)

def load(name):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    gold=np.array([float(l[-4]) for l in lines])  # PhScore1
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols])
    return gold,coords,mols[0]

def score(coords, m0, mode="sum", D=3.5, ex_on=True):
    fp,_,_,_,_=ligand_phore_features(m0)
    P=coords.shape[0]
    tot=np.zeros(P)
    for t in set(f.type for f in feats):
        fs=[f for f in feats if f.type==t]
        fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
        atoms=np.where(fp[:,TYPES.index(t)]>0)[0]
        if len(atoms)==0: continue
        d2=((coords[:,atoms,None,:]-fc[None,None])**2).sum(-1)
        v=(np.sqrt(fw*W[t])*8*(math.pi/(fa+AL[t]))**1.5
           *np.exp(-fa*AL[t]*d2/(fa+AL[t])))   # (P, n_at, F)
        if mode=="sum":
            tot+=v.sum((1,2))
        elif mode=="max":
            tot+=v.max(1).sum(1)
        else:  # assignment with cutoff
            dd=np.sqrt(d2)
            for p in range(P):
                sub=v[p].copy(); sub[dd[p]>D]=-1e-6
                r,c=linear_sum_assignment(-sub)
                s=sub[r,c]; tot[p]+=s[s>0].sum()
    ovp=tot/V_ref
    if not ex_on: return ovp
    vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
    aa=(K/vdw**2)[None,:,None]
    d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
    g=(np.sqrt(exw)*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))
    return ovp - g/500.0

names=[d.split("__")[-1].rstrip("/") for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/"))]
data={n:load(n) for n in names}

for mode,D in (("sum",0),("max",0),("assign",2.5),("assign",3.5),("assign",4.5)):
    within=[]; g_max=[]; p_max=[]
    for n in names:
        gold,coords,m0=data[n]
        pred=score(coords,m0,mode,D)
        within.append(spearmanr(gold,pred).statistic)
        g_max.append(gold.max()); p_max.append(pred.max())
    cross=spearmanr(g_max,p_max).statistic
    print(f"mode={mode} D={D}: within mean={np.mean(within):.4f} min={np.min(within):.4f} cross={cross:.4f}")
