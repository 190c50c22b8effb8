"""Native runtime components (C++ via ctypes).

The compute path of this framework is JAX/XLA/Pallas; the pieces that are
native C++ in the reference stay native here: the exact-attention oracle
(ref: src/util/naive_attention.h) lives in csrc/naive_attention.cpp and is
bridged by runtime.native. Import is lazy — `native.available()` gates
machines without a toolchain.
"""

from cuda_flashattention_tpu.runtime import native  # noqa: F401
