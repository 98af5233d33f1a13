from lct_gan_tpu.eval.compare import (
    ModelComparator,
    make_deepfilternet_system,
    make_jax_system,
    make_torch_reference_system,
    plot_spec,
    plot_specs_stack,
    plot_specs_triptych,
)

from lct_gan_tpu.eval.serve import bake_enhance
from lct_gan_tpu.eval.streaming import StreamingEnhancer, enhance_in_chunks

__all__ = [
    "StreamingEnhancer",
    "bake_enhance",
    "enhance_in_chunks",
    "plot_specs_triptych",
    "ModelComparator",
    "make_deepfilternet_system",
    "make_jax_system",
    "make_torch_reference_system",
    "plot_spec",
    "plot_specs_stack",
]
