"""Add geometric H positions and re-test the EX overlap identity."""
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

def h_positions(mol, coords):
    """Crude geometric H placement: each implicit H at 1.09 A along the
    negative sum of bond vectors (good enough to test the hypothesis)."""
    out=[]
    nbrs={i:[] for i in range(mol.num_atoms)}
    for i,j,_ in mol.bonds:
        nbrs[i].append(j); nbrs[j].append(i)
    for i in range(mol.num_atoms):
        nh = mol.implicit_h_count(i)
        if nh<=0: continue
        v = np.zeros(3)
        for j in nbrs[i]:
            d = coords[j]-coords[i]
            v += d/np.linalg.norm(d)
        if np.linalg.norm(v)<1e-6:
            v=np.array([1.0,0,0])
        u=-v/np.linalg.norm(v)
        for k in range(nh):
            out.append(coords[i]+1.09*u)  # stack all nh at same point (approx)
    return np.array(out) if out else np.zeros((0,3))

names=[d.split("__")[-1].rstrip("/") for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/"))]
for name in names[:6]:
    d=f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines=[l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    Vex=np.array([float(l[9]) for l in lines])
    mols=parse_sdf(glob.glob(d+f"/*{name}.sdf")[0])
    m0=mols[0]
    g_all=[]
    aH=K/VDW[1]**2
    for m in mols:
        coords=m.coords
        vdw=np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
        aa=(K/vdw**2)[:,None]
        d2=((coords[:,None,:]-exc[None])**2).sum(-1)
        g=(8*(math.pi/(exa[None]+aa))**1.5*np.exp(-exa[None]*aa*d2/(exa[None]+aa))).sum()
        hp=h_positions(m0, coords)
        if len(hp):
            d2h=((hp[:,None,:]-exc[None])**2).sum(-1)
            g+= (8*(math.pi/(exa[None]+aH))**1.5*np.exp(-exa[None]*aH*d2h/(exa[None]+aH))).sum()
        g_all.append(g)
    g_all=np.array(g_all)
    scale=np.dot(g_all,Vex)/np.dot(g_all,g_all)
    print(f"{name}: corr={np.corrcoef(g_all,Vex)[0,1]:.4f} scale={scale:.3f} nH={sum(m0.implicit_h_count(i) for i in range(m0.num_atoms))}")
