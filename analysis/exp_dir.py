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
names=[d.split("__")[-1].rstrip("/") for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/"))]
def load(name):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    gold=np.array([float(l[-4]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    return gold,np.stack([m.coords for m in mols]),mols[0]
data={n:load(n) for n in names}

def run(aromn_w, dir_mode, dir_pow=1.0):
    within=[]; gm=[]; pm=[]
    for n in names:
        gold,coords,m0=data[n]
        fp,norms,a1,a2,_=ligand_phore_features(m0)  # norms (A,11,3) relative
        fp=fp.copy()
        for i,a in enumerate(m0.atoms):
            if a.atomic_num==7 and a.is_aromatic:
                fp[i,1]=max(fp[i,1],aromn_w)
        P=coords.shape[0]; tot=np.zeros(P)
        # norms are defined in the ORIGINAL input frame... the pose files have
        # moved coordinates; relative norms rotate with the local frame - as an
        # approximation recompute norms per pose? ligand_phore_features uses
        # mol.coords; redo per pose (host cost fine for analysis)
        for t in set(f.type for f in feats):
            k=TYPES.index(t)
            fs=[f for f in feats if f.type==t]
            fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
            fn=np.array([f.norm for f in fs]); has_n=np.array([f.has_norm for f in fs])
            fdir=fn-fc  # ref norm direction (norm point - feature point)
            fdir=fdir/np.maximum(np.linalg.norm(fdir,axis=-1,keepdims=True),1e-9)
            atoms=np.where(fp[:,k]>0)[0]
            if len(atoms)==0: continue
            soft=fp[atoms,k]
            d2=((coords[:,atoms,None,:]-fc[None,None])**2).sum(-1)
            v=(np.sqrt(fw*W[t])*8*(math.pi/(fa+AL[t]))**1.5*np.exp(-fa*AL[t]*d2/(fa+AL[t])))
            v=v*soft[None,:,None]
            if dir_mode and t in ("HD","HA","MB"):
                # per-pose ligand norms
                for p in range(P):
                    m0.coords[:] = coords[p]
                    _,nn,_,_,_=ligand_phore_features(m0)
                    dirs=nn[atoms,k,:]  # (n_at,3) relative norm
                    L=np.linalg.norm(dirs,axis=-1,keepdims=True)
                    ok=(L[:,0]>1e-6)
                    dirs=np.where(L>1e-6,dirs/np.maximum(L,1e-9),0.0)
                    cosv=np.einsum("af,ff->af" if False else "ak,fk->af",dirs,fdir)
                    fac=np.clip(cosv,0,1)**dir_pow
                    fac=np.where(ok[:,None]&has_n[None,:], fac, 1.0)
                    v[p]=v[p]*fac
            tot+=v.max(1).sum(1)
        ovp=tot/V_ref
        vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
        aa=(K/vdw**2)[None,:,None]
        d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
        g=(np.sqrt(exw)*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))
        pred=ovp-g/500.0
        within.append(spearmanr(gold,pred).statistic)
        gm.append(gold.max()); pm.append(pred.max())
    print(f"aromN={aromn_w} dir={dir_mode} pow={dir_pow}: within={np.mean(within):.4f} min={np.min(within):.4f} cross={spearmanr(gm,pm).statistic:.4f}")

run(1.0, False)
run(1.0, True, 0.5)
run(1.0, True, 1.0)
run(0.7, True, 1.0)
