from .validation import null_pk_split, dedup_split, count_within_threshold  # noqa: F401
from .cleansing import remove_junk_characters  # noqa: F401
from .scd2 import scd2_merge, SCD2_META_COLS  # noqa: F401
from .asof import asof_join, range_join  # noqa: F401
