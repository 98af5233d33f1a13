from lct_gan_tpu.models.generator import (
    LCTGeneratorConfig,
    FreqGRUBlock,
    TimeGRUBlock,
    LctGenerator,
    LctEnhancer,
)
from lct_gan_tpu.models.discriminators import (
    PeriodDiscriminator,
    MultiPeriodDiscriminator,
    ScaleDiscriminator,
    MultiScaleDiscriminator,
)
from lct_gan_tpu.models.gru import GroupedGRU
from lct_gan_tpu.models.attention import (
    MultiHeadSelfAttention,
    banded_causal_mask,
)

__all__ = [
    "LCTGeneratorConfig",
    "FreqGRUBlock",
    "TimeGRUBlock",
    "LctGenerator",
    "LctEnhancer",
    "PeriodDiscriminator",
    "MultiPeriodDiscriminator",
    "ScaleDiscriminator",
    "MultiScaleDiscriminator",
    "GroupedGRU",
    "MultiHeadSelfAttention",
    "banded_causal_mask",
]
