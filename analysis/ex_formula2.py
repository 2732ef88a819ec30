import glob, math, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
K = 2.41798725037
VDW = {1:1.2,5:1.92,6:1.7,7:1.55,8:1.52,9:1.47,14:2.1,15:1.8,16:1.8,17:1.75,35:1.85,53:1.98}

def load(name):
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    Vex=np.array([float(l[9]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols])
    return Vex, coords, mols[0]

ex=[f for f in PH.all_points if f.type=="EX"]
exc=np.array([f.coord for f in ex]); exa=np.array([f.alpha for f in ex])
R_ex=np.sqrt(K/exa)  # 1.7

def hard_overlap(coords, vdw):
    d=np.sqrt(((coords[:,:,None,:]-exc[None,None])**2).sum(-1))  # (P,A,E)
    R1=vdw[None,:,None]; R2=R_ex[None,None,:]
    vol=np.zeros_like(d)
    lo=np.abs(R1-R2); hi=R1+R2
    inside=d<=lo
    mid=(d>lo)&(d<hi)
    small=np.minimum(R1,R2)*np.ones_like(d)
    vol[inside]=(4/3*math.pi*small**3)[inside]
    dd=np.where(mid,d,1.0)
    v=math.pi*(R1+R2-dd)**2*(dd**2+2*dd*(R1+R2)-3*(R1-R2)**2)/(12*dd)
    vol[mid]=v[mid]
    return vol

for name in ("STK674854","STK936575","STK255897"):
    Vex,coords,m0=load(name)
    vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
    hv=hard_overlap(coords,vdw)
    cands={
      "hard_sum": hv.sum((1,2)),
      "hard_max_per_ex": hv.max(1).sum(1),
      "hard_max_per_atom": hv.max(2).sum(1),
    }
    # gaussian max per ex
    aa=(K/vdw**2)[None,:,None]
    d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
    g=8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))
    cands["gauss_max_per_ex"]=g.max(1).sum(1)
    cands["gauss_max_per_atom"]=g.max(2).sum(1)
    for k,v in cands.items():
        c=np.corrcoef(v,Vex)[0,1]
        scale=np.dot(v,Vex)/np.dot(v,v)
        resid=np.abs(scale*v-Vex).max()
        print(f"{name} {k}: corr={c:.5f} scale={scale:.4f} max_err={resid:.3f}")
    print()
