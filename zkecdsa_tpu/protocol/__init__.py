from .batch import BatchProver, batched_prove_signature_list, device_params_for  # noqa: F401
from .batch_verify import BatchVerifier, batch_verify_signature_list  # noqa: F401
from .verify import batched_verify_signature_list, device_msm, device_msm_backend  # noqa: F401
