import sys
sys.path.insert(0,"/root/repo")
import numpy as np
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.pharmacophore_rules import ligand_phore_features
TYPES=["MB","HD","AR","PO","HA","HY","NE","CV","CR","XB","EX"]
for name in ("STK936575","STK255897","STL432840"):
    # the pose file (H-free, what AncPhore scored)
    m=parse_sdf(f"/root/reference/examples/output/2/mapping_process/sQC_Substrate__{name}/sQC_Substrate__{name}.sdf")[0]
    fp,_,_,_,_=ligand_phore_features(m)
    print(f"== {name}")
    for i,a in enumerate(m.atoms):
        flags=[TYPES[k] for k in range(10) if fp[i,k]>0]
        nb=[ (j if i==ii else ii, o) for ii,j,o in m.bonds if i in (ii,j)]
        print(f"  {i:2d} Z={a.atomic_num:2d} arom={getattr(a,'is_aromatic',None)} impH={m.implicit_h_count(i)} chg={getattr(a,"charge",0)} nbrs={nb} {flags}")
