"""Curated public-dataset loaders — parity with the reference's
``daft.datasets`` namespace (reference ``daft/datasets/``: each loader
resolves a public HuggingFace dataset to a DataFrame).

Every loader routes through read_huggingface, so the offline story is
identical: pre-stage the dataset under $DAFT_SPARK_HF_MIRROR (the
snapshot_download layout) and the same call works air-gapped.
"""

from __future__ import annotations


def _hf(repo: str, **options):
    from daft_spark import read_huggingface

    return read_huggingface(repo, **options)


def fineweb(config: str = "default", **options):
    """HuggingFaceFW/fineweb — web-scale pretraining text."""
    return _hf("HuggingFaceFW/fineweb", **options)


def fineweb_edu(**options):
    return _hf("HuggingFaceFW/fineweb-edu", **options)


def common_crawl(**options):
    """Common Crawl WARC index mirrors; for raw WARC use read_warc."""
    return _hf("commoncrawl/statistics", **options)


def red_pajama(**options):
    return _hf("togethercomputer/RedPajama-Data-1T", **options)


def lineitem(sf_dir: str = "/root/testdata/sf0.01", **options):
    """The local TPC-H-ish fixture's lineitem (offline smoke data)."""
    from daft_spark import read_parquet

    return read_parquet(f"{sf_dir}/lineitem.parquet", **options)
