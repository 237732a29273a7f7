"""Pure-python tiktoken-file BPE vs the reference's REAL token fixtures
(tests/assets/tokens/*.tiktoken) — mirrors the reference's
tests/recordbatch/test_tokenize.py and tests/integration/
test_file_tokenize.py without needing the tiktoken package. The llama3
case carries the reference's own expected ids, so the merge loop and
the split pattern are validated against real tiktoken output, not a
self-consistent reimplementation."""

import os

import pytest
from pyspark.sql import functions as F

TOKENS = "/root/reference/tests/assets/tokens"
TOKEN_FILE = f"{TOKENS}/tokens_5k.tiktoken"
P50K_REGEX = (
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"
    "|\\s+(?!\\S)|\\s+"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TOKENS), reason="reference fixtures unavailable"
)


def _encode(spark, data, path=TOKEN_FILE, **kw):
    from daft_spark.functions.text import tokenize_encode

    df = spark.createDataFrame([(x,) for x in data], "a string")
    kw.setdefault("pattern", P50K_REGEX)
    return [
        r["ids"]
        for r in df.select(
            tokenize_encode(F.col("a"), path, **kw).alias("ids")
        ).collect()
    ]


def test_file_token_encode_decode_roundtrip(spark):
    from daft_spark.functions.text import tokenize_decode

    data = ["hello custom tokenizer!", "hopefully this works", "", "wow!"]
    ids = _encode(spark, data)
    assert ids[2] == []
    df = spark.createDataFrame([(x,) for x in ids], "a array<long>")
    back = [
        r["t"]
        for r in df.select(
            tokenize_decode(F.col("a"), TOKEN_FILE, pattern=P50K_REGEX).alias("t")
        ).collect()
    ]
    assert back == data


def test_llama3_special_tokens_exact_ids(spark):
    """The reference's own expected ids for tokens_5k + llama3 specials
    (tests/recordbatch/test_tokenize.py::test_tokenize_llama3_special_tokens)
    — real-tiktoken ground truth for the BPE merge loop AND the split
    pattern (reserved_special_token_256 is NOT special and must
    byte-pair encode through the p50k pattern)."""
    data = [
        "<|begin_of_text|><|end_of_text|>",
        "<|reserved_special_token_0|><|reserved_special_token_1|><|reserved_special_token_2|>",
        "<|reserved_special_token_3|>",
        "<|start_header_id|><|end_header_id|><|reserved_special_token_4|><|eot_id|>",
        "<|reserved_special_token_255|><|reserved_special_token_256|>",
    ]
    got = _encode(spark, data, special_tokens="llama3")
    assert got == [
        [5000, 5001],
        [5002, 5003, 5004],
        [5005],
        [5006, 5007, 5008, 5009],
        [5260, 27, 91, 411, 712, 276, 62, 4125, 2413, 62, 83, 4233, 62,
         1495, 21, 91, 29],
    ]


def test_bad_token_files_error_messages(spark):
    from daft_spark.functions.text import tokenize_encode

    with pytest.raises(ValueError, match="Error decoding base 64 token IGFyZQ= with rank 389"):
        tokenize_encode(F.lit("x"), f"{TOKENS}/bad_base64.tiktoken", pattern=P50K_REGEX)
    with pytest.raises(ValueError, match="Error parsing rank number 4I5"):
        tokenize_encode(F.lit("x"), f"{TOKENS}/bad_rank.tiktoken", pattern=P50K_REGEX)
    with pytest.raises(ValueError, match="Invalid line in token file"):
        tokenize_encode(F.lit("x"), f"{TOKENS}/bad_token.tiktoken", pattern=P50K_REGEX)
    with pytest.raises(ValueError, match="Token file has no tokens"):
        tokenize_encode(F.lit("x"), f"{TOKENS}/empty.tiktoken", pattern=P50K_REGEX)
    with pytest.raises(ValueError, match="Pattern must be provided for non-builtin token sets"):
        tokenize_encode(F.lit("x"), TOKEN_FILE)
