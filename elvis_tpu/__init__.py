"""elvis-tpu: a TPU-native adaptive video compression framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
ELVIS/PRESLEY content-aware video compression research pipeline
(reference: emanuele-artioli/elvis): per-block removability scoring,
bit-saving degradation strategies (block removal, ROI quantization maps,
adaptive downsampling, block-wise blur, DCT dampening), client-side
restoration (progressive super-resolution, deblurring, inpainting), and a
bitrate-matched quality evaluation harness.

Unlike the reference -- which stages every intermediate through PNG files
and parallelizes by chunking frames across GPUs via subprocesses -- this
framework keeps batched frame tensors resident on TPU between stages,
implements degradation/restoration as fused kernels, and scales via
jax.sharding over a device mesh.
"""

from elvis_tpu.version import __version__

__all__ = ["__version__", "ElvisConfig", "run_elvis", "NvcCodec"]


def __getattr__(name):
    # Lazy top-level API (importing the pipeline pulls in jax/flax; keep
    # `import elvis_tpu` cheap for tooling).
    if name == "ElvisConfig":
        from elvis_tpu.pipeline.config import ElvisConfig

        return ElvisConfig
    if name == "run_elvis":
        from elvis_tpu.pipeline.run import run_elvis

        return run_elvis
    if name == "NvcCodec":
        from elvis_tpu.codec.nvc.codec import NvcCodec

        return NvcCodec
    raise AttributeError(name)
