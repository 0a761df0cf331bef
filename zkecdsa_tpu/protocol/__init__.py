from .batch import BatchProver, batched_prove_signature_list  # noqa: F401
