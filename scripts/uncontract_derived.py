"""Uncontract a derived NWChem table (the segmented contraction lost
energy; the optimized primitives themselves are HF-limit-grade)."""
import sys, re
el = sys.argv[1]
src = open(f"/tmp/derived_{el}.nwchem").read()
lines = src.splitlines()
out = ["BASIS"]
cur = None
for ln in lines[1:]:
    if ln.startswith("END"):
        break
    m = re.match(r"^([A-Za-z]{1,2})\s+([SPDFG])$", ln.strip())
    if m:
        cur = m.groups()
        continue
    exp = float(ln.split()[0])
    out.append(f"{cur[0]}    {cur[1]}")
    out.append(f"      {exp:16.7f}    1.0000000000")
out.append("END")
open(f"/tmp/derived_{el}_unc.nwchem", "w").write("\n".join(out) + "\n")
print(f"wrote /tmp/derived_{el}_unc.nwchem "
      f"({sum(1 for l in out if l[0].isalpha() and l!='BASIS' and l!='END')} shells)")
