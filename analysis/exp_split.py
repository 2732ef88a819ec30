import glob, math, sys
import numpy as np
from scipy.stats import spearmanr
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
for name in ("STK779818","STK243239","STK441223","STK324209"):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    g_ov=np.array([float(l[11]) for l in lines])   # ov_pct
    g_ex=np.array([float(l[12]) for l in lines])   # ex_pct
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols]); m0=mols[0]
    fp,_,_,_,_=ligand_phore_features(m0); fp=fp.copy()
    for i,a in enumerate(m0.atoms):
        if a.atomic_num==7 and a.is_aromatic: fp[i,1]=1
    P=coords.shape[0]; tot=np.zeros(P)
    per_type={}
    for t in set(f.type for f in feats):
        fs=[f for f in feats if f.type==t]
        fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
        atoms=np.where(fp[:,TYPES.index(t)]>0)[0]
        if len(atoms)==0: continue
        d2=((coords[:,atoms,None,:]-fc[None,None])**2).sum(-1)
        v=(np.sqrt(fw*W[t])*8*(math.pi/(fa+AL[t]))**1.5*np.exp(-fa*AL[t]*d2/(fa+AL[t])))
        per_type[t]=v.max(1).sum(1)
        tot+=per_type[t]
    ovp=tot/V_ref
    vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
    aa=(K/vdw**2)[None,:,None]
    d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
    g=(np.sqrt(exw)*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))
    print(f"{name}: ov_corr={spearmanr(g_ov,ovp).statistic:.3f} ex_corr={spearmanr(g_ex,g).statistic:.3f} "
          f"ov_range gold=({g_ov.min():.2f},{g_ov.max():.2f}) ours=({ovp.min():.2f},{ovp.max():.2f}) "
          f"ex_pct gold=({g_ex.min():.3f},{g_ex.max():.3f}) ours=({(g/500).min():.3f},{(g/500).max():.3f})")
    for t,v in per_type.items():
        print(f"    {t}: corr_with_gold_ov={spearmanr(g_ov,v).statistic:.3f} mean={v.mean():.2f}")
