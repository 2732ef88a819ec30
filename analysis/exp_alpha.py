import glob, math, sys
import numpy as np
from scipy.stats import spearmanr
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.pharmacophore_rules import scoring_phore_fp
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
data={}
for n in names:
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{n}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    gold=np.array([float(l[-4]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{n}.sdf")[0])
    coords=np.stack([m.coords for m in mols]); m0=mols[0]
    fp=scoring_phore_fp(m0)
    vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
    aa=(K/vdw**2)[None,:,None]
    d2e=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
    g=(np.sqrt(exw)*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2e/(exa[None,None]+aa))).sum((1,2))
    data[n]=(gold,coords,fp,g)

def run(am):
    within=[]; gm=[]; pm=[]
    for n in names:
        gold,coords,fp,g=data[n]
        P=coords.shape[0]; tot=np.zeros(P)
        for t in set(f.type for f in feats):
            fs=[f for f in feats if f.type==t]
            fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
            atoms=np.where(fp[:,TYPES.index(t)]>0)[0]
            if len(atoms)==0: continue
            a_db=AL[t]*am
            d2=((coords[:,atoms,None,:]-fc[None,None])**2).sum(-1)
            v=(np.sqrt(fw*W[t])*8*(math.pi/(fa+a_db))**1.5*np.exp(-fa*a_db*d2/(fa+a_db)))
            tot+=v.max(1).sum(1)
        pred=tot/V_ref-g/500.0
        within.append(spearmanr(gold,pred).statistic)
        gm.append(gold.max()); pm.append(pred.max())
    print(f"alpha_mult={am}: within={np.mean(within):.4f} min={np.min(within):.4f} cross={spearmanr(gm,pm).statistic:.4f}")

for am in (0.5,0.7,1.0,1.4,2.0,3.0):
    run(am)
