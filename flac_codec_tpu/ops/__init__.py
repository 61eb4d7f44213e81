"""Device plane: batched JAX/XLA kernels over (batch, channels, block) frames.

Everything numeric in the encode path (SURVEY §7 device plane): stereo
decorrelation candidates, wasted-bits analysis, FIXED diff cascades, the LPC
stack (window -> autocorrelation -> Levinson-Durbin -> expected-bits order
choice -> error-feedback quantization -> residuals), Rice partition-sum
search, and exact bit accounting for candidate selection.  The decode-side
LPC synthesis scan lives in ``predict``.

All kernels are shape-static (block size fixed per encoder instance, orders
padded to 32, partitions padded to 64) so XLA compiles once per
configuration; the batch axis supplies the parallelism and is what
``parallel.batch`` shards over the mesh.
"""

from . import decorrelate, fixed, lpc, rice  # noqa: F401
from .encode_batch import encode_frames_plan  # noqa: F401
