from lct_gan_tpu.metrics.sisdr import si_sdr, batch_si_sdr
from lct_gan_tpu.metrics.stoi import stoi
from lct_gan_tpu.metrics.fwsegsnr import fwsegsnr
from lct_gan_tpu.metrics.pesq_p862 import pesq_p862
from lct_gan_tpu.metrics.external import (
    pesq_score,
    pesq_estimate,
    stoi_score,
    compute_metrics_for_pair,
    pesq_available,
)

__all__ = [
    "si_sdr",
    "batch_si_sdr",
    "stoi",
    "fwsegsnr",
    "pesq_p862",
    "pesq_score",
    "pesq_estimate",
    "stoi_score",
    "compute_metrics_for_pair",
    "pesq_available",
]
