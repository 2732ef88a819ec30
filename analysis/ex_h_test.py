import glob, math, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
K = 2.41798725037
VDW = {1:1.2,5:1.92,6:1.7,7:1.55,8:1.52,9:1.47,14:2.1,15:1.8,16:1.8,17:1.75,35:1.85,53:1.98}
ex=[f for f in PH.all_points if f.type=="EX"]
exc=np.array([f.coord for f in ex]); exa=np.array([f.alpha for f in ex])

names=[d.split("__")[-1].rstrip("/") for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/"))]
for name in names:
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    Vex=np.array([float(l[9]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    coords=np.stack([m.coords for m in mols])
    m0=mols[0]
    vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
    aa=(K/vdw**2)[None,:,None]
    d2=((coords[:,:,None,:]-exc[None,None])**2).sum(-1)
    g=(8*(math.pi/(exa[None,None]+aa))**1.5*np.exp(-exa[None,None]*aa*d2/(exa[None,None]+aa))).sum((1,2))
    scale=np.dot(g,Vex)/np.dot(g,g)
    nH=sum(getattr(a,"num_hs",0) or 0 for a in m0.atoms)
    nHeavy=m0.num_atoms
    corr=np.corrcoef(g,Vex)[0,1]
    print(f"{name}: corr={corr:.4f} scale={scale:.3f} nHeavy={nHeavy} nH={nH} (H+heavy)/heavy={(nH+nHeavy)/nHeavy:.3f}")
