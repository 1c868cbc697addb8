"""TPU compute kernels (Pallas) with XLA fallbacks.

The native layer of this framework (SURVEY.md section 2/7): the
reference's implicit cuDNN/flash-SDP acceleration becomes explicit
Pallas/Mosaic kernels here, behind backend-dispatching entry points so
CPU tests run everywhere.
"""

from .attention import dot_product_attention_xla, multi_head_attention

__all__ = ["dot_product_attention_xla", "multi_head_attention"]
