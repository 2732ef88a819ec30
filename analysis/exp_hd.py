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
names=[d.split("__")[-1].rstrip("/") for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/"))]

def load(name):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    gold=np.array([float(l[-4]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    return gold,np.stack([m.coords for m in mols]),mols[0]
data={n:load(n) for n in names}

def run(variant, mode="max"):
    within=[]; gm=[]; pm=[]
    for n in names:
        gold,coords,m0=data[n]
        fp,_,_,_,_=ligand_phore_features(m0)
        fp=fp.copy()
        if variant=="hd_union_ha":
            fp[:,1]=np.maximum(fp[:,1],fp[:,4])
        elif variant=="hd_union_mb":
            fp[:,1]=np.maximum(fp[:,1],fp[:,0])
        P=coords.shape[0]; tot=np.zeros(P)
        for t in set(f.type for f in feats):
            fs=[f for f in feats if f.type==t]
            fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
            atoms=np.where(fp[:,TYPES.index(t)]>0)[0]
            if len(atoms)==0: continue
            d2=((coords[:,atoms,None,:]-fc[None,None])**2).sum(-1)
            v=(np.sqrt(fw*W[t])*8*(math.pi/(fa+AL[t]))**1.5*np.exp(-fa*AL[t]*d2/(fa+AL[t])))
            if mode=="max": tot+=v.max(1).sum(1)
            else: tot+=v.sum((1,2))
        ovp=tot/V_ref
        vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
        aa=(K/vdw**2)[None,:,None]
        d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
        g=(np.sqrt(exw)*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))
        pred=ovp-g/500.0
        within.append(spearmanr(gold,pred).statistic)
        gm.append(gold.max()); pm.append(pred.max())
    print(f"{variant:14s} {mode}: within mean={np.mean(within):.4f} min={np.min(within):.4f} cross={spearmanr(gm,pm).statistic:.4f}")

for v in ("base","hd_union_ha","hd_union_mb"):
    run(v,"max")

def run2(extra, label, mode="max"):
    from diffphore_tpu.chem.pharmacophore_rules import _double_nbrs, _valence, _heavy_nbrs
    within=[]; gm=[]; pm=[]
    for n in names:
        gold,coords,m0=data[n]
        fp,_,_,_,_=ligand_phore_features(m0)
        fp=fp.copy()
        for i,a in enumerate(m0.atoms):
            if extra(m0,i,a): fp[i,1]=1
        P=coords.shape[0]; tot=np.zeros(P)
        for t in set(f.type for f in feats):
            fs=[f for f in feats if f.type==t]
            fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
            atoms=np.where(fp[:,TYPES.index(t)]>0)[0]
            if len(atoms)==0: continue
            d2=((coords[:,atoms,None,:]-fc[None,None])**2).sum(-1)
            v=(np.sqrt(fw*W[t])*8*(math.pi/(fa+AL[t]))**1.5*np.exp(-fa*AL[t]*d2/(fa+AL[t])))
            if mode=="max": tot+=v.max(1).sum(1)
            else: tot+=v.sum((1,2))
        ovp=tot/V_ref
        vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
        aa=(K/vdw**2)[None,:,None]
        d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
        g=(np.sqrt(exw)*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))
        pred=ovp-g/500.0
        within.append(spearmanr(gold,pred).statistic)
        gm.append(gold.max()); pm.append(pred.max())
    print(f"{label:22s} {mode}: within mean={np.mean(within):.4f} min={np.min(within):.4f} cross={spearmanr(gm,pm).statistic:.4f}")

run2(lambda m,i,a: a.atomic_num==7 and a.is_aromatic, "HD+aromN", "max")
run2(lambda m,i,a: a.atomic_num==7, "HD+anyN", "max")
run2(lambda m,i,a: a.atomic_num==8, "HD+anyO", "max")
run2(lambda m,i,a: a.atomic_num==8 and len([j for ii,j,o in m.bonds if i in (ii,j) and o==2])>0, "HD+carbonylO", "max")
run2(lambda m,i,a: False, "base2", "sum")
run2(lambda m,i,a: a.atomic_num==7, "HD+anyN", "sum")
