"""cctpu — TPU-native quantum-chemistry and chemistry-ML framework.

A brand-new framework built from scratch in JAX (jit / pjit / shard_map +
Pallas TPU kernels) providing the full capability surface of the reference
workflow stack turnDeep/Computational-Chemistry-AI (see /root/repo/SURVEY.md):
Gaussian integrals, HF/DFT SCF with DIIS and density fitting, Becke-grid XC,
analytic gradients via AD-through-SCF, geometry optimization, Hessians /
frequencies / IR / thermochemistry, TDDFT, GIAO NMR, PCM solvation, MP2,
CASSCF/CASCI, and a GCN EI-MS spectrum predictor — plus the twelve
SMILES-driven workflow CLIs.

Quantum chemistry needs float64 accumulation (|dE| <= 1e-8 Ha targets), so we
enable x64 at import. ML paths explicitly request f32/bf16 where appropriate.
"""

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from cctpu.core.molecule import Molecule  # noqa: E402,F401
