"""AI provider registry — parity with the reference provider protocol
(reference: ``daft/ai/provider.py`` Provider ABC + load_provider
registry, ``daft/ai/openai/``, ``daft/ai/transformers/``,
``daft/ai/vllm/``, ``daft/ai/lm_studio/``).

A Provider resolves *executor-side model factories* for the three text
protocols the multimodal operators consume (embed / classify /
prompt). The Spark shape: ``get_*`` returns a zero-argument picklable
factory; ``llm.py`` instantiates it ONCE per executor process (lazy
singleton) and serves every Arrow batch with it — the reference's
actor-pool pattern without actors.

Model runtimes (openai, transformers, vllm) are not installed in this
container, so those providers raise ``ProviderImportError`` at
construction — a clean, documented gate, same contract as the
reference's ``pip install 'daft[openai]'`` errors. The
``deterministic`` provider ships working stand-ins so every pipeline
stays executable and oracle-testable.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Callable


class ProviderImportError(ImportError):
    """Raised when a provider's runtime package is absent."""

    def __init__(self, package: str, function: str | None = None):
        function_msg = f" to use the {function} function" if function is not None else ""
        super().__init__(
            f"Please install '{package}'{function_msg} to use this provider "
            "(runtime not available in this environment)."
        )


def _not_implemented(provider: "Provider", method: str) -> NotImplementedError:
    return NotImplementedError(
        f"{method} is not currently implemented for the '{provider.name}' provider"
    )


class Provider(ABC):
    """Base class resolving model factories for the AI protocols
    (reference daft/ai/provider.py:104 Provider)."""

    @property
    @abstractmethod
    def name(self) -> str:
        """The provider's name."""

    def get_text_embedder(
        self, model: str | None = None, dimensions: int | None = None, **options: Any
    ) -> Callable[[], object]:
        """Factory for an object with ``embed(texts) -> list[vec]``."""
        raise _not_implemented(self, "embed_text")

    def get_text_classifier(
        self, model: str | None = None, **options: Any
    ) -> Callable[[], object]:
        """Factory for an object with ``embed(texts)`` used for
        argmax-over-label-embeddings classification."""
        raise _not_implemented(self, "classify_text")

    def get_prompter(
        self, model: str | None = None, **options: Any
    ) -> Callable[[], object]:
        """Factory for an object with ``generate(prompts) -> list[str]``."""
        raise _not_implemented(self, "llm_generate")


class DeterministicProvider(Provider):
    """The in-container provider: hash-derived embeddings and echo
    generation — deterministic, dependency-free, oracle-friendly."""

    def __init__(self, name: str | None = None, **options: Any):
        self._model = name

    @property
    def name(self) -> str:
        return "deterministic"

    def get_text_embedder(self, model=None, dimensions=None, **options):
        from daft_spark.multimodal.llm import HashEmbedProvider

        return HashEmbedProvider

    def get_text_classifier(self, model=None, **options):
        from daft_spark.multimodal.llm import HashEmbedProvider

        return HashEmbedProvider

    def get_prompter(self, model=None, **options):
        from daft_spark.multimodal.llm import EchoProvider

        return EchoProvider


class OpenAIProvider(Provider):
    """OpenAI-compatible API provider (reference daft/ai/openai/).
    Requires the ``openai`` package; raises ProviderImportError here."""

    def __init__(self, name: str | None = None, **options: Any):
        try:
            import openai  # noqa: F401
        except ImportError as e:
            raise ProviderImportError("openai") from e
        self._model = name or "gpt-4o-mini"
        self._options = options

    @property
    def name(self) -> str:
        return "openai"

    def get_text_embedder(self, model=None, dimensions=None, **options):
        mdl = model or "text-embedding-3-small"
        opts = dict(self._options)

        def factory():
            import openai

            client = openai.OpenAI(**opts)

            class _Embedder:
                def embed(self, texts):
                    rsp = client.embeddings.create(
                        model=mdl, input=list(texts), dimensions=dimensions
                    )
                    return [d.embedding for d in rsp.data]

            return _Embedder()

        return factory

    def get_prompter(self, model=None, **options):
        mdl = model or self._model
        opts = dict(self._options)

        def factory():
            import openai

            client = openai.OpenAI(**opts)

            class _Prompter:
                def generate(self, prompts):
                    return [
                        client.chat.completions.create(
                            model=mdl, messages=[{"role": "user", "content": p}]
                        )
                        .choices[0]
                        .message.content
                        for p in prompts
                    ]

            return _Prompter()

        return factory


class LMStudioProvider(OpenAIProvider):
    """LM Studio speaks the OpenAI API on a local port (reference
    daft/ai/lm_studio/)."""

    def __init__(self, name: str | None = None, **options: Any):
        options.setdefault("base_url", "http://localhost:1234/v1")
        super().__init__(name, **options)

    @property
    def name(self) -> str:
        return "lm_studio"


class TransformersProvider(Provider):
    """Local HuggingFace transformers models (reference
    daft/ai/transformers/). Requires ``transformers``; raises here."""

    def __init__(self, name: str | None = None, **options: Any):
        try:
            import transformers  # noqa: F401
        except ImportError as e:
            raise ProviderImportError("transformers") from e
        self._model = name
        self._options = options

    @property
    def name(self) -> str:
        return "transformers"

    def get_text_embedder(self, model=None, dimensions=None, **options):
        mdl = model or self._model or "sentence-transformers/all-MiniLM-L6-v2"

        def factory():
            from transformers import pipeline

            pipe = pipeline("feature-extraction", model=mdl)

            class _Embedder:
                def embed(self, texts):
                    feats = pipe(list(texts))
                    # mean-pool token features -> one vector per text
                    return [
                        [sum(col) / len(col) for col in zip(*f[0])] for f in feats
                    ]

            return _Embedder()

        return factory


class VLLMProvider(Provider):
    """vLLM local engine provider (reference daft/ai/vllm/, the
    VLLMProject operator ops/vllm.rs:12). Requires ``vllm``; raises
    here. On a real cluster: one engine per executor, bound to its GPU
    via spark.task.resource.gpu.amount=1."""

    def __init__(self, name: str | None = None, **options: Any):
        try:
            import vllm  # noqa: F401
        except ImportError as e:
            raise ProviderImportError("vllm") from e
        self._model = name
        self._options = options

    @property
    def name(self) -> str:
        return "vllm"

    def get_prompter(self, model=None, **options):
        mdl = model or self._model
        opts = dict(self._options)

        def factory():
            from vllm import LLM, SamplingParams

            engine = LLM(model=mdl, **opts)

            class _Prompter:
                def generate(self, prompts):
                    outs = engine.generate(list(prompts), SamplingParams(**options))
                    return [o.outputs[0].text for o in outs]

            return _Prompter()

        return factory


PROVIDERS: dict[str, Callable[..., Provider]] = {
    "deterministic": DeterministicProvider,
    "openai": OpenAIProvider,
    "lm_studio": LMStudioProvider,
    "transformers": TransformersProvider,
    "vllm": VLLMProvider,
}


def load_provider(provider: str, name: str | None = None, **options: Any) -> Provider:
    """Instantiate a provider by registry name (reference
    daft/ai/provider.py:94 load_provider)."""
    if provider not in PROVIDERS:
        raise ValueError(
            f"Provider '{provider}' is not supported (have: {sorted(PROVIDERS)})."
        )
    return PROVIDERS[provider](name, **options)
