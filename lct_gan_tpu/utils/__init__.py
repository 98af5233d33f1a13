from lct_gan_tpu.utils.cache import enable_compile_cache
from lct_gan_tpu.utils.config import (
    append_csv_row,
    ensure_dir,
    now_timestamp,
    to_jsonable,
    write_json,
)

__all__ = [
    "append_csv_row",
    "enable_compile_cache",
    "ensure_dir",
    "now_timestamp",
    "to_jsonable",
    "write_json",
]
