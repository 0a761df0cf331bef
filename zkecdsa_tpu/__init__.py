"""zkecdsa_tpu - a TPU-native ZKAttest framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
cloudflare/zkp-ecdsa (ZKAttest: proof of knowledge of an ECDSA-P256
signature under one of a ring of public keys), redesigned TPU-first:

* host scalar layer (this package's ``bignum``/``curves``/``commit``/
  ``exp``/``proofGK`` modules) - the exact-semantics correctness anchor and
  serde/Fiat-Shamir path;
* batched device layer (``ops``: base-2^7 float32-digit field arithmetic
  on the VPU, branchless complete-formula curve kernels, shared-window
  batched MSM; ``protocol``: phase-structured batched prove/verify over
  proof batches; ``parallel``: mesh-sharded execution).

Public API mirrors the reference entry point (reference src/index.ts):
serde + curve instances + the ZKAttest list API.
"""

from .curves.instances import ALL_GROUPS, p256, tomEdwards256, war256  # noqa: F401
from .serde import read_json, write_json  # noqa: F401
from .zkp_attest_list import (  # noqa: F401
    SignatureProofList,
    SystemParametersList,
    generate_params_list,
    prove_signature_list,
    verify_signature_list,
)
from .ecdsa import key_to_int  # noqa: F401

__version__ = "0.1.0"
