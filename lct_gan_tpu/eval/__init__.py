from lct_gan_tpu.eval.compare import (
    ModelComparator,
    make_jax_system,
    make_torch_reference_system,
    plot_spec,
    plot_specs_stack,
)

__all__ = [
    "ModelComparator",
    "make_jax_system",
    "make_torch_reference_system",
    "plot_spec",
    "plot_specs_stack",
]
