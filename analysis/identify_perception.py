"""Identify AncPhore's per-atom MB/HD/HA flags from golden per-pose V_overlap.

V_overlap(pose) = sum_{a,t} x_{a,t} * M[pose, (a,t)] is LINEAR in the binary
indicators x; 40 poses per ligand make this identifiable.  Also checks the
perception-independent V_exOverlap identity.
"""
import glob, os, math, sys
import numpy as np
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.data.phore import parse_phore

PH = parse_phore("/root/reference/examples/phore/sQC_QFA_complex.phore")[0]
TYPE_W = {"MB":1.5,"HD":1.2,"AR":1.0,"PO":1.5,"HA":1.2,"HY":0.5,"NE":1.5,"CV":1.0,"CR":1.0,"XB":1.0}
TYPE_A = {"MB":1.0,"HD":1.0,"AR":0.7,"PO":1.0,"HA":1.0,"HY":0.7,"NE":1.0,"CV":1.0,"CR":0.7,"XB":1.0}
K = 2.41798725037
VDW = {1:1.2,5:1.92,6:1.7,7:1.55,8:1.52,9:1.47,14:2.1,15:1.8,16:1.8,17:1.75,35:1.85,53:1.98}

def pair_vol(w1,w2,a1,a2,r2):
    return math.sqrt(w1*w2)*8*(math.pi/(a1+a2))**1.5*np.exp(-a1*a2*r2/(a1+a2))

def analyze(name):
    d = f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}"
    lines = [l.split("\t") for l in open(glob.glob(d+"/*.score")[0])]
    V_gold = np.array([float(l[7]) for l in lines])
    Vex_gold = np.array([float(l[9]) for l in lines])
    mols = parse_sdf(glob.glob(d+f"/sQC_Substrate__{name}.sdf")[0])
    # poses are H-free already? check
    coords = np.stack([m.coords for m in mols])  # (40, A, 3)
    m0 = mols[0]
    A = coords.shape[1]
    # --- V_exOverlap check (perception independent)
    ex = [f for f in PH.all_points if f.type=="EX"]
    exc = np.array([f.coord for f in ex]); exw=np.array([f.weight for f in ex]); exa=np.array([f.alpha for f in ex])
    vdw = np.array([VDW.get(a.atomic_num,1.7) for a in m0.atoms])
    aa = K/vdw**2
    d2 = ((coords[:,:,None,:]-exc[None,None])**2).sum(-1)  # (40,A,E)
    vex = (np.sqrt(exw*1.0)*8*(math.pi/(exa[None,None]+aa[None,:,None]))**1.5
           *np.exp(-exa[None,None]*aa[None,:,None]*d2/(exa[None,None]+aa[None,:,None]))).sum((1,2))
    # --- linear identification of x_{a,t}
    feats = [f for f in PH.features]
    cols = []
    labels = []
    for t in ("MB","HD","HA"):
        fs = [f for f in feats if f.type==t]
        if not fs: continue
        fc = np.array([f.coord for f in fs]); fw=np.array([f.weight for f in fs]); fa=np.array([f.alpha for f in fs])
        d2f = ((coords[:,:,None,:]-fc[None,None])**2).sum(-1)  # (40,A,F)
        v = (np.sqrt(fw*TYPE_W[t])*8*(math.pi/(fa+TYPE_A[t]))**1.5
             *np.exp(-fa*TYPE_A[t]*d2f/(fa+TYPE_A[t]))).sum(-1)  # (40,A)
        for a in range(A):
            cols.append(v[:,a]); labels.append((a,t))
    M = np.stack(cols,1)  # (40, A*3)
    # greedy forward selection of binary indicators
    resid = V_gold.copy(); sel=[]
    x = np.zeros(M.shape[1])
    for _ in range(M.shape[1]):
        scores = []
        for j in range(M.shape[1]):
            if x[j]: continue
            r = resid - M[:,j]
            scores.append((np.sum(r**2), j))
        scores.sort()
        err2, j = scores[0]
        if err2 >= np.sum(resid**2) - 1e-9: break
        x[j]=1; resid = resid - M[:,j]; sel.append(j)
    pred = M@x
    elems = {a.index if hasattr(a,'index') else i: a for i,a in enumerate(m0.atoms)}
    chosen = [(labels[j][0], labels[j][1], m0.atoms[labels[j][0]].atomic_num) for j in sel]
    rel = np.abs(pred-V_gold)/np.maximum(V_gold,1e-9)
    print(f"{name}: ex_err max={np.abs(vex-Vex_gold).max():.4f} | overlap fit: rms={np.sqrt(np.mean((pred-V_gold)**2)):.3f} max_rel={rel.max():.4f} chosen={sorted(chosen)}")
    return chosen, m0

for n in ("STK674854","STK936575","STK255897"):
    analyze(n)
