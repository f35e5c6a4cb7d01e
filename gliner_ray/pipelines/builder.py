"""User-extension surface: named-stage pipeline builder.

The reference exposes extension points through ``GLiNERBasePipeline``
(template methods, ``gliner/multitask/base.py:8-112``), registries
(``WordsSplitter`` ``tokenizer.py:269-296``; ``SpanRepLayer``
``span_rep.py:381-417``) and config-driven model assembly
(``model.py:60-94``). The engine's equivalent (SURVEY.md §2.11) is a
list of named stages, each a batch transform — a plain function
(stateless tasks) or a callable class (actor pool) — applied in order
with ``map_batches``:

    pipe = (PipelineBuilder()
            .stage("stats", text_stats_batch)
            .stage("score", DeterministicScorer, cfg=cfg, concurrency=8)
            .build())
    out_ds = pipe(in_ds)

Custom extractors/normalizers/predicates register the same way; a
stage registry allows config-driven assembly by name.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable

_REGISTRY: dict[str, Callable] = {}


def register_stage(name: str, fn_or_cls: Callable) -> None:
    """Register a transform for by-name (config-driven) assembly."""
    _REGISTRY[name] = fn_or_cls


def get_stage(name: str) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


class PipelineBuilder:
    def __init__(self):
        self._stages: list[tuple[str, Callable, dict]] = []

    def stage(
        self,
        name: str,
        fn_or_cls: Callable | str | None = None,
        *,
        batch_format: str = "pyarrow",
        batch_size: int | None = None,
        concurrency: int | tuple | None = None,
        num_cpus: float | None = None,
        **constructor_kwargs: Any,
    ) -> "PipelineBuilder":
        """Append a stage. ``fn_or_cls`` may be a registered name.

        Functions run as stateless tasks; classes become actor pools
        (``concurrency`` required then — the map_batches contract).
        """
        if fn_or_cls is None or isinstance(fn_or_cls, str):
            fn_or_cls = get_stage(fn_or_cls or name)
        opts: dict[str, Any] = {"batch_format": batch_format}
        if batch_size is not None:
            opts["batch_size"] = batch_size
        if num_cpus is not None:
            opts["num_cpus"] = num_cpus
        if inspect.isclass(fn_or_cls):
            opts["fn_constructor_kwargs"] = constructor_kwargs
            opts["concurrency"] = concurrency if concurrency is not None else (1, 4)
        elif constructor_kwargs:
            raise ValueError(
                f"stage {name!r}: constructor kwargs only apply to class stages"
            )
        elif concurrency is not None:
            opts["concurrency"] = concurrency
        self._stages.append((name, fn_or_cls, opts))
        return self

    def build(self) -> Callable:
        stages = list(self._stages)

        def run(ds):
            for _, fn, opts in stages:
                ds = ds.map_batches(fn, **opts)
            return ds

        run.stage_names = [n for n, _, _ in stages]  # type: ignore[attr-defined]
        return run
