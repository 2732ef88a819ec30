"""Our chem perception per golden ligand vs AncPhore V_db decomposition."""
import glob, os, math
import numpy as np
import sys
sys.path.insert(0, "/root/repo")
from diffphore_tpu.chem import parse_sdf
from diffphore_tpu.chem.pharmacophore_rules import ligand_phore_features

TYPES = ["MB","HD","AR","PO","HA","HY","NE","CV","CR","XB","EX"]
W = dict(zip(TYPES,[1.5,1.2,1.0,1.5,1.2,0.5,1.5,1.0,1.0,1.0,1.0]))
A = dict(zip(TYPES,[1.0,1.0,0.7,1.0,1.0,0.7,1.0,1.0,0.7,1.0,0.837]))
SV = {t: W[t]*8*(math.pi/(2*A[t]))**1.5 for t in TYPES}

gold = {}
for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/")):
    sc = glob.glob(os.path.join(d,"*.score"))
    if not sc: continue
    name = os.path.basename(d.rstrip("/")).split("__")[1]
    gold[name] = float(open(sc[0]).readline().split("\t")[5])

for name, vdb in sorted(gold.items()):
    f = f"/root/reference/examples/ligands/{name}.sdf"
    if not os.path.exists(f):
        print(name, "NO SDF"); continue
    mol = parse_sdf(f)[0].remove_hs()
    fp, norms, a1, a2, counts = ligand_phore_features(mol)
    atom_counts = {TYPES[k]: int(fp[:,k].sum()) for k in range(10)}
    # aromatic ring count + HY connected components
    from diffphore_tpu.chem.mol import Molecule
    try:
        rings = [r for r in mol.rings] if hasattr(mol, "rings") else None
    except Exception:
        rings = None
    # HY components: adjacency restricted to HY atoms
    hy = np.where(fp[:,5]>0)[0]
    adj = {i:set() for i in hy}
    for i,j,_ in mol.bonds:
        if i in adj and j in adj: adj[i].add(j); adj[j].add(i)
    seen=set(); comp=0
    for i in hy:
        if i in seen: continue
        comp+=1; stack=[i]
        while stack:
            x=stack.pop()
            if x in seen: continue
            seen.add(x); stack.extend(adj[x]-seen)
    # per-atom V_db
    v_atom = sum(atom_counts[t]*SV[t] for t in atom_counts)
    print(f"{name}: V_db_gold={vdb:8.3f} per-atom={v_atom:8.3f} counts={atom_counts} HY_comps={comp}")
