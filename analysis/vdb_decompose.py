"""Decompose golden V_db values into per-type feature counts.

V_db = sum_t n_t * sv_t with sv_t = w_t * 8 * (pi/(2 a_t))**1.5.
Distinct sv classes: MB/PO/NE=23.6245, HD/HA=18.8996, AR/CR=26.8937,
HY=13.4469, CV/XB/UNDEF=15.7497.  Enumerate small nonneg counts.
"""
import glob, os, itertools, math
import numpy as np

sv = {}
W = {"MB":1.5,"HD":1.2,"AR":1.0,"PO":1.5,"HA":1.2,"HY":0.5,"NE":1.5,"CV":1.0,"CR":1.0,"XB":1.0}
A = {"MB":1.0,"HD":1.0,"AR":0.7,"PO":1.0,"HA":1.0,"HY":0.7,"NE":1.0,"CV":1.0,"CR":0.7,"XB":1.0}
for t in W:
    sv[t] = W[t]*8*(math.pi/(2*A[t]))**1.5

# distinct volume classes
classes = {"S1_MB_PO_NE": sv["MB"], "S2_HD_HA": sv["HD"], "S3_AR_CR": sv["AR"],
           "S4_HY": sv["HY"], "S5_CV_XB": sv["CV"]}
print({k: round(v,4) for k,v in classes.items()})

rows = []
for d in sorted(glob.glob("/root/reference/examples/output/2/mapping_process/*/")):
    sc = glob.glob(os.path.join(d, "*.score"))
    if not sc: continue
    line = open(sc[0]).readline().split("\t")
    name = os.path.basename(d.rstrip("/"))
    vdb = float(line[5])
    rows.append((name, vdb))

vals = list(classes.values())
names = list(classes.keys())
for name, vdb in rows:
    best = []
    for combo in itertools.product(range(0,15), range(0,15), range(0,6), range(0,10), range(0,4)):
        v = sum(c*x for c,x in zip(combo, vals))
        err = abs(v - vdb)
        if err < 0.05:
            best.append((err, combo))
    best.sort()
    print(f"{name} V_db={vdb}: " + "; ".join(
        f"{dict(zip(names,c))} err={e:.3f}" for e,c in best[:4]))
