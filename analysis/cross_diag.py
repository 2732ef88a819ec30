import glob, math, sys
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/analysis")
from rankcorr_harness import load, score, names, data, TYPES
from diffphore_tpu.chem.pharmacophore_rules import ligand_phore_features

print(f"{'name':12s} {'gold_max':>8s} {'ours_max':>8s} {'MB':>3s} {'HD':>3s} {'HA':>3s}")
rows=[]
for n in names:
    gold,coords,m0=data[n]
    pred=score(coords,m0,"max",0)
    fp,_,_,_,_=ligand_phore_features(m0)
    mb,hd,ha=int(fp[:,0].sum()),int(fp[:,1].sum()),int(fp[:,4].sum())
    rows.append((n,gold.max(),pred.max(),mb,hd,ha))
    print(f"{n:12s} {gold.max():8.3f} {pred.max():8.3f} {mb:3d} {hd:3d} {ha:3d}")
g=np.array([r[1] for r in rows]); p=np.array([r[2] for r in rows])
print("pearson:", np.corrcoef(g,p)[0,1])
