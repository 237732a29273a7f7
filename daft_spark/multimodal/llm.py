"""Batch LLM / embedding inference operators.

Parity targets: ``daft/functions/llm.py:11`` (llm_generate),
``daft/functions/ai/`` (embed_text :72, embed_image :157, classify_text
:250), the vLLM operator (``ops/vllm.rs:12``,
``streaming_sink/vllm.rs``) and provider protocol (``daft/ai/``).

Spark-first design — the reference's actor-pool + dynamic batching
becomes:
- ``mapInPandas`` with a per-executor lazy model singleton (load once,
  serve every batch on that executor);
- Arrow batch size controls the inference batch
  (spark.sql.execution.arrow.maxRecordsPerBatch);
- GPU binding via spark.task.resource.gpu.amount — one task per GPU.

No model runtimes exist in this container, so providers are pluggable:
pass any callable ``batch -> outputs``; ``EchoProvider``/
``HashEmbedProvider`` are deterministic stand-ins that keep the whole
pipeline executable and testable.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_PROVIDERS: dict[str, object] = {}


def _singleton(key: str, factory: Callable[[], object]) -> object:
    """Per-executor-process model cache (the @daft.cls actor replacement)."""
    inst = _PROVIDERS.get(key)
    if inst is None:
        inst = factory()
        _PROVIDERS[key] = inst
    return inst


class EchoProvider:
    """Deterministic text 'model': f(prompt) = reversed prompt tag."""

    def generate(self, prompts: list[str]) -> list[str]:
        return [f"echo:{(p or '')[:48][::-1]}" for p in prompts]


class HashEmbedProvider:
    """Deterministic embedding 'model': 16-dim hash-derived unit vector."""

    def embed(self, texts: list[str]) -> list[list[float]]:
        import hashlib
        import math

        out = []
        for t in texts:
            h = hashlib.sha256((t or "").encode()).digest()
            v = [((b / 255.0) * 2 - 1) for b in h[:16]]
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            out.append([x / n for x in v])
        return out


def _resolve_factory(provider, method: str, fallback: Callable[[], object]):
    """Map a ``provider=`` argument (registry name, Provider instance, or
    None) to an executor-side model factory; ``provider_factory`` wins
    for back-compat when given explicitly."""
    if provider is None:
        return fallback
    from daft_spark.multimodal.provider import Provider, load_provider

    if isinstance(provider, str):
        provider = load_provider(provider)
    if not isinstance(provider, Provider):
        raise TypeError(f"provider must be a registry name or Provider, got {type(provider)}")
    return getattr(provider, method)()


def llm_generate(
    df: DataFrame,
    prompt_col: str,
    out_col: str = "generation",
    provider_factory: Callable[[], object] = EchoProvider,
    batch_size: int | None = None,
    provider: "str | object | None" = None,
) -> DataFrame:
    """Batched text generation (reference llm_generate, llm.py:11).
    One model instance per executor; prompts flow through in Arrow
    batches; output cardinality 1:1. ``provider`` accepts a registry
    name ('deterministic', 'openai', 'lm_studio', 'transformers',
    'vllm') or a Provider instance (multimodal/provider.py)."""
    provider_factory = _resolve_factory(provider, "get_prompter", provider_factory)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` string"
    key = f"llm:{provider_factory.__module__}.{provider_factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _singleton(key, provider_factory)
        for pdf in batches:
            prompts = list(pdf[prompt_col])
            if batch_size:
                outs: list[str] = []
                for i in range(0, len(prompts), batch_size):
                    outs.extend(model.generate(prompts[i : i + batch_size]))
            else:
                outs = model.generate(prompts)
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(run, schema)


def embed_text(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    provider_factory: Callable[[], object] = HashEmbedProvider,
    provider: "str | object | None" = None,
) -> DataFrame:
    """Batched text embedding (reference embed_text, ai/:72). Output is
    array<float> — the Embedding dtype convention (SURVEY §1.2).
    ``provider`` as in llm_generate."""
    provider_factory = _resolve_factory(provider, "get_text_embedder", provider_factory)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` array<float>"
    key = f"embed:{provider_factory.__module__}.{provider_factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _singleton(key, provider_factory)
        for pdf in batches:
            pdf[out_col] = model.embed(list(pdf[text_col]))
            yield pdf

    return df.mapInPandas(run, schema)


def classify_text(
    df: DataFrame,
    text_col: str,
    labels: list[str],
    out_col: str = "label",
    provider_factory: Callable[[], object] | None = None,
    provider: "str | object | None" = None,
) -> DataFrame:
    """Batched zero-shot-style classification (reference classify_text,
    ai/:250). Default deterministic provider: argmax over hash-embedding
    dot products with label embeddings. ``provider`` as in llm_generate."""
    if provider is not None:
        provider_factory = _resolve_factory(provider, "get_text_classifier", provider_factory)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` string"
    factory = provider_factory or HashEmbedProvider
    key = f"clf:{factory.__module__}.{factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _singleton(key, factory)
        label_vecs = model.embed(labels)
        for pdf in batches:
            vecs = model.embed(list(pdf[text_col]))
            preds = []
            for v in vecs:
                scores = [sum(a * b for a, b in zip(v, lv)) for lv in label_vecs]
                preds.append(labels[max(range(len(labels)), key=scores.__getitem__)])
            pdf[out_col] = preds
            yield pdf

    return df.mapInPandas(run, schema)


def embed_image(
    df: DataFrame,
    image_col: str,
    out_col: str = "embedding",
    provider_factory: Callable[[], object] = HashEmbedProvider,
    provider: "str | object | None" = None,
) -> DataFrame:
    """Batched image embedding (reference embed_image, ai/:157).
    Input is the binary image column (decoded pixels are the gated
    multimodal/image.py stage); output array<float>. No vision runtime
    exists in this container, so the default provider derives a
    deterministic unit vector from the image BYTES — the pipeline
    plumbing (per-executor singleton, Arrow batching, schema) is the
    real thing and a real provider drops in via ``provider=``."""
    provider_factory = _resolve_factory(provider, "get_image_embedder", provider_factory)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` array<float>"
    key = f"iembed:{provider_factory.__module__}.{provider_factory.__qualname__}"

    def _as_text(v) -> str:
        if v is None:
            return ""
        if isinstance(v, (bytes, bytearray)):
            import hashlib

            return hashlib.sha256(bytes(v)).hexdigest()
        return str(v)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _singleton(key, provider_factory)
        for pdf in batches:
            pdf[out_col] = model.embed([_as_text(v) for v in pdf[image_col]])
            yield pdf

    return df.mapInPandas(run, schema)


def classify_image(
    df: DataFrame,
    image_col: str,
    labels: list[str],
    out_col: str = "label",
    provider_factory: Callable[[], object] | None = None,
    provider: "str | object | None" = None,
) -> DataFrame:
    """Batched zero-shot image classification (reference
    classify_image, ai/:329): most-probable label per image. Default
    deterministic provider scores hash-derived image vectors against
    label embeddings — same contract as classify_text."""
    if provider is not None:
        provider_factory = _resolve_factory(
            provider, "get_image_classifier", provider_factory
        )
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` string"
    factory = provider_factory or HashEmbedProvider
    key = f"iclf:{factory.__module__}.{factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        model = _singleton(key, factory)
        label_vecs = model.embed(labels)
        for pdf in batches:
            texts = [
                hashlib.sha256(bytes(v)).hexdigest()
                if isinstance(v, (bytes, bytearray))
                else str(v or "")
                for v in pdf[image_col]
            ]
            vecs = model.embed(texts)
            preds = []
            for v in vecs:
                scores = [sum(a * b for a, b in zip(v, lv)) for lv in label_vecs]
                preds.append(labels[max(range(len(labels)), key=scores.__getitem__)])
            pdf[out_col] = preds
            yield pdf

    return df.mapInPandas(run, schema)


def prompt(
    df: DataFrame,
    message_cols: "list[str] | str",
    out_col: str = "response",
    system_message: str | None = None,
    provider_factory: Callable[[], object] = EchoProvider,
    provider: "str | object | None" = None,
    batch_size: int | None = None,
) -> DataFrame:
    """Batched multi-message prompting (reference prompt, ai/:453):
    each row's message columns concatenate (system message first) into
    one model prompt; output is the response string. The reference's
    structured-output/multimodal message handling belongs to the real
    provider; the dataframe contract (message assembly, batching,
    1:1 cardinality) is what this operator owns."""
    provider_factory = _resolve_factory(provider, "get_prompter", provider_factory)
    cols = [message_cols] if isinstance(message_cols, str) else list(message_cols)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"prompt message columns not in frame: {missing}")
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{fields}, `{out_col}` string"
    key = f"prompt:{provider_factory.__module__}.{provider_factory.__qualname__}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _singleton(key, provider_factory)
        for pdf in batches:
            prompts = []
            for i in range(len(pdf)):
                parts = [] if system_message is None else [system_message]
                parts.extend(str(pdf[c].iloc[i]) for c in cols)
                prompts.append("\n".join(parts))
            if batch_size:
                outs: list[str] = []
                for i in range(0, len(prompts), batch_size):
                    outs.extend(model.generate(prompts[i : i + batch_size]))
            else:
                outs = model.generate(prompts)
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(run, schema)
