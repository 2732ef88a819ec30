"""Assignment model with a pair-distance cutoff; jointly fit flags + cutoff."""
import glob, math, sys
import numpy as np
from scipy.optimize import linear_sum_assignment
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
TYPE_W={"MB":1.5,"HD":1.2,"HA":1.2}
TYPE_A={"MB":1.0,"HD":1.0,"HA":1.0}

def load(name):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    V=np.array([float(l[7]) for l in lines])
    n4=np.array([int(l[3]) for l in lines])
    n5=np.array([int(l[4]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols])
    return V,n4,n5,coords,mols[0]

def pose_pairvols(coords):
    out={}
    for t in ("MB","HD","HA"):
        fs=[f for f in PH.features if f.type==t]
        fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
        d2=((coords[:,:,None,:]-fc[None,None])**2).sum(-1)
        v=(np.sqrt(fw*TYPE_W[t])*8*(math.pi/(fa+TYPE_A[t]))**1.5
           *np.exp(-fa*TYPE_A[t]*d2/(fa+TYPE_A[t])))
        out[t]=(v, np.sqrt(d2))
    return out

def v_assign(pv, flags, p, D):
    total=0.0; n_pairs=0
    for t in ("MB","HD","HA"):
        atoms=[a for (tt,a) in flags if tt==t]
        if not atoms: continue
        sub=pv[t][0][p][atoms,:].copy()
        dd=pv[t][1][p][atoms,:]
        sub[dd>D]= -1e-6   # infeasible pair
        r,c=linear_sum_assignment(-sub)
        for i,j in zip(r,c):
            if sub[i,j]>0:
                total+=sub[i,j]; n_pairs+=1
    return total, n_pairs

def fit(name, Ds=(1.5,2.0,2.5,3.0,3.5,4.0,5.0)):
    V,n4,n5,coords,m0=load(name)
    A=coords.shape[1]; P=len(V)
    pv=pose_pairvols(coords)
    best_overall=None
    for D in Ds:
        flags=[]
        def resid(fl):
            preds=[v_assign(pv,fl,p,D) for p in range(P)]
            vv=np.array([x[0] for x in preds]); nn=np.array([x[1] for x in preds])
            return np.sqrt(((vv-V)**2).mean()) + 2.0*np.abs(nn-n4).mean(), vv, nn
        cur,_,_=resid(flags)
        while True:
            best=(cur,None)
            for t in ("MB","HD","HA"):
                for a in range(A):
                    if (t,a) in flags: continue
                    r,_,_=resid(flags+[(t,a)])
                    if r<best[0]-1e-6: best=(r,(t,a))
            if best[1] is None: break
            flags.append(best[1]); cur=best[0]
        r,vv,nn=resid(flags)
        corr=np.corrcoef(vv,V)[0,1]
        n4acc=(nn==n4).mean()
        if best_overall is None or r<best_overall[0]:
            best_overall=(r,D,flags,corr,n4acc)
    r,D,flags,corr,n4acc=best_overall
    print(f"{name}: D={D} obj={r:.4f} corr={corr:.5f} n4_acc={n4acc:.2f} "
          f"flags={sorted((t,a,m0.atoms[a].atomic_num) for t,a in flags)}")

for n in ("STK674854","STK936575"):
    fit(n)
