import glob, math, sys
import numpy as np
from scipy.optimize import nnls
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
TYPE_W={"MB":1.5,"HD":1.2,"HA":1.2}
TYPE_A={"MB":1.0,"HD":1.0,"HA":1.0}

def analyze(name, combine="sum"):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    V=np.array([float(l[7]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols])
    m0=mols[0]
    A=coords.shape[1]
    cols=[]; labels=[]
    for t in ("MB","HD","HA"):
        fs=[f for f in PH.features if f.type==t]
        fc=np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
        d2=((coords[:,:,None,:]-fc[None,None])**2).sum(-1)
        v=(np.sqrt(fw*TYPE_W[t])*8*(math.pi/(fa+TYPE_A[t]))**1.5
           *np.exp(-fa*TYPE_A[t]*d2/(fa+TYPE_A[t])))  # (P,A,F)
        vv = v.sum(-1)
        for a in range(A):
            cols.append(vv[:,a]); labels.append((t,a,m0.atoms[a].atomic_num))
    M=np.stack(cols,1)
    x,res=nnls(M,V)
    pred=M@x
    rel=np.abs(pred-V)/np.maximum(V,1e-9)
    nz=[(labels[j],round(float(x[j]),3)) for j in np.where(x>1e-3)[0]]
    print(f"{name}: nnls resid rms={np.sqrt(res**2/len(V)) if np.isscalar(res) else res:.4f} max_rel={rel.max():.4f}")
    print("   nz:", nz)

for n in ("STK674854","STK936575","STK255897","STL432840"):
    analyze(n)
