import glob, math, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
K = 2.41798725037
VDW = {1:1.2,5:1.92,6:1.7,7:1.55,8:1.52,9:1.47,14:2.1,15:1.8,16:1.8,17:1.75,35:1.85,53:1.98}

name="STK674854"
d = f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
Vex_gold=np.array([float(l[9]) for l in lines])
mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
coords=np.stack([m.coords for m in mols])
m0=mols[0]
ex=[f for f in PH.all_points if f.type=="EX"]
exc=np.array([f.coord for f in ex]); exw=np.array([f.weight for f in ex]); exa=np.array([f.alpha for f in ex])
vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)

def gauss(a1,a2,w):  # (E,) alphas vs (A,) atom alphas
    aa=a2[None,:,None]
    return (w*8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))

cands = {
 "sqrt(0.5)_Kvdw": gauss(exa, K/vdw**2, math.sqrt(0.5)),
 "w1.0_Kvdw": gauss(exa, K/vdw**2, 1.0),
 "w0.5_Kvdw": gauss(exa, K/vdw**2, 0.5),
 "w1.0_a0.837atom": gauss(exa, np.full(len(vdw),0.837), 1.0),
 "w1.0_a1.0atom": gauss(exa, np.full(len(vdw),1.0), 1.0),
 "sqrt0.5_a0.837atom": gauss(exa, np.full(len(vdw),0.837), math.sqrt(0.5)),
}
for k,v in cands.items():
    c=np.corrcoef(v,Vex_gold)[0,1]
    scale=np.dot(v,Vex_gold)/np.dot(v,v)
    resid=np.abs(scale*v-Vex_gold).max()
    print(f"{k}: corr={c:.5f} best_scale={scale:.4f} max_err_after_scale={resid:.3f} ratio_mean={(Vex_gold/v).mean():.4f} ratio_std={(Vex_gold/v).std():.4f}")
