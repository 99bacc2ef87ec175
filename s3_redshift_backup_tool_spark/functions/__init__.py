"""The engine's scalar/column function library, in one namespace.

Everything here is a pure ``Column -> Column`` builder over built-in
``pyspark.sql.functions`` (JVM-side, codegen-friendly, no Python UDFs),
collected from the operator modules so users can compose them directly:

    from s3_redshift_backup_tool_spark import functions as EF
    df.select(EF.md5_prefix_int("text"), EF.quality_score(F.col("text")))

Hash functions are md5-prefix-int64 for cross-engine reproducibility
(the DuckDB oracle reproduces them bit-for-bit); swap in ``F.xxhash64``
at deployment for speed where portability doesn't matter.
"""

from __future__ import annotations

from ..operators.align import (
    cast_boolean,
    cast_string_with_null_semantics,
    cast_to,
    epoch_to_timestamp,
    normalize_timestamp_string,
    timestamp_to_epoch,
)
from ..operators.layout import interleave_bits
from ..operators.sampling import hash_gate, sample_by_hash, split_by_hash
from ..operators.similarity import (
    cosine,
    dot,
    dot_literal,
    l2_norm,
    l2_sq,
    srp_bucket,
)
from ..operators.text import (
    avg_token_len,
    fingerprint,
    lang_id,
    md5_prefix_int,
    pii_counts,
    punct_ratio,
    quality_score,
    scrub_pii,
    stopword_ratio,
    token_count_bpe,
    token_count_regex,
    token_count_ws,
    tokens,
)

__all__ = [
    "avg_token_len", "cast_boolean", "cast_string_with_null_semantics",
    "cast_to", "cosine", "dot", "dot_literal", "epoch_to_timestamp",
    "hash_gate", "interleave_bits", "sample_by_hash", "split_by_hash",
    "fingerprint", "l2_norm", "l2_sq", "lang_id", "md5_prefix_int",
    "normalize_timestamp_string", "pii_counts", "punct_ratio",
    "quality_score", "scrub_pii", "srp_bucket", "stopword_ratio",
    "timestamp_to_epoch", "token_count_bpe", "token_count_regex",
    "token_count_ws", "tokens",
]
