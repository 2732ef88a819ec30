"""Identify per-atom MB/HD/HA flags under a 1:1 assignment V_overlap model."""
import glob, math, sys
import numpy as np
from scipy.optimize import linear_sum_assignment
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
TYPE_W={"MB":1.5,"HD":1.2,"HA":1.2}
TYPE_A={"MB":1.0,"HD":1.0,"HA":1.0}

def pose_pairvols(coords, types_atoms):
    """v[t] arrays (P, A, F_t)."""
    out={}
    for t in ("MB","HD","HA"):
        fs=[f for f in PH.features if f.type==t]
        fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
        d2=((coords[:,:,None,:]-fc[None,None])**2).sum(-1)
        out[t]=(np.sqrt(fw*TYPE_W[t])*8*(math.pi/(fa+TYPE_A[t]))**1.5
                *np.exp(-fa*TYPE_A[t]*d2/(fa+TYPE_A[t])))
    return out

def v_assign(pv, flags, p):
    """Max-weight 1:1 assignment between ref feats (cols) and flagged atoms."""
    # build block matrix: rows = flagged (t,a) "db features", cols = ref feats of same type
    rows=[]; cols=[]; vals=[]
    total=0.0; n_pairs=0
    for t in ("MB","HD","HA"):
        atoms=[a for (tt,a) in flags if tt==t]
        if not atoms: continue
        sub=pv[t][p][atoms,:]  # (n_at, F_t)
        r,c=linear_sum_assignment(-sub)
        total+=sub[r,c].sum(); n_pairs+=len(r)
    return total, n_pairs

def fit(name, verbose=True):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    V=np.array([float(l[7]) for l in lines])
    n4=np.array([int(l[3]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols])
    m0=mols[0]
    A=coords.shape[1]; P=len(mols)
    pv=pose_pairvols(coords, None)
    flags=[]
    def resid(fl):
        pred=np.array([v_assign(pv, fl, p)[0] for p in range(P)])
        return np.sqrt(((pred-V)**2).mean()), pred
    cur,_=resid(flags)
    while True:
        best=(cur,None)
        for t in ("MB","HD","HA"):
            for a in range(A):
                if (t,a) in flags: continue
                r,_=resid(flags+[(t,a)])
                if r<best[0]-1e-6: best=(r,(t,a))
        if best[1] is None: break
        flags.append(best[1]); cur=best[0]
    r,pred=resid(flags)
    npairs=np.array([v_assign(pv,flags,p)[1] for p in range(P)])
    rel=np.abs(pred-V)/np.maximum(V,1e-9)
    corr=np.corrcoef(pred,V)[0,1]
    print(f"{name}: rms={r:.4f} max_rel={rel.max():.4f} corr={corr:.5f} "
          f"flags={sorted((t,a,m0.atoms[a].atomic_num) for t,a in flags)}")
    print(f"   col4 gold={n4[:10]} pred_pairs={npairs[:10]}")

for n in ("STK674854","STK936575","STL432840"):
    fit(n)
