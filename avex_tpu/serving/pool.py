"""Multi-model co-hosting: one process, one chip, N micro-batched services.

The economics that motivate this are TPU-specific: a v5e chip has ~16 GB of
HBM and a BEATs-class encoder needs ~0.1-0.6 GB of weights (half that under
the int8 serving mode, see ``avex_tpu.quant``), so a single serving process
can keep a whole model zoo resident and route per-request — the deployment
shape bioacoustics pipelines actually want (e.g. BirdNet-style detection +
Perch-style embeddings + a fine-tuned BEATs probe over the same stream).

Each pooled model keeps its own :class:`InferenceService` — its own request
queue, batcher thread, and compiled bucket universe — so one model's traffic
never changes another's tensor shapes. Device dispatch from concurrent
batcher threads is safe (JAX serializes enqueues on the device stream); the
per-model queues simply interleave programs, and the XLA compile cache keys
on (model, bucket) so the program sets stay disjoint.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Sequence

from avex_tpu.serving.service import InferenceService, ServiceConfig

__all__ = ["ServicePool"]


class ServicePool:
    """Named collection of :class:`InferenceService` instances.

    Insertion order is meaningful: the first added service is the pool's
    *default*, served on the bare ``/embed`` | ``/logits`` routes for
    backward compatibility with single-model clients.
    """

    def __init__(self) -> None:
        self._services: Dict[str, InferenceService] = {}

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    def add(self, name: str, service: InferenceService) -> "ServicePool":
        """Register ``service`` under ``name`` (chainable)."""
        if name in self._services:
            raise ValueError(f"model {name!r} already pooled")
        self._services[name] = service
        return self

    @classmethod
    def from_models(
        cls,
        models: Dict[str, Any],
        config: Optional[ServiceConfig] = None,
        configs: Optional[Dict[str, ServiceConfig]] = None,
    ) -> "ServicePool":
        """Pool already-loaded models: ``{name: model}`` (+ optional per-name
        ``configs`` overriding the shared ``config``)."""
        pool = cls()
        for name, model in models.items():
            cfg = (configs or {}).get(name, config)
            pool.add(name, InferenceService(model, cfg))
        return pool

    # ------------------------------------------------------------------
    # Lookup
    # ------------------------------------------------------------------

    def get(self, name: str) -> InferenceService:
        """The service for ``name`` (KeyError with the known names if absent)."""
        try:
            return self._services[name]
        except KeyError:
            raise KeyError(
                f"unknown model {name!r}; pooled models: {sorted(self._services)}"
            ) from None

    @property
    def default(self) -> InferenceService:
        """The first-added service (the bare-route model)."""
        if not self._services:
            raise RuntimeError("empty pool")
        return next(iter(self._services.values()))

    def names(self) -> list:
        """Pooled model names, insertion-ordered (default first)."""
        return list(self._services)

    def __contains__(self, name: str) -> bool:
        return name in self._services

    def __len__(self) -> int:
        return len(self._services)

    def __iter__(self) -> Iterator[str]:
        return iter(self._services)

    # ------------------------------------------------------------------
    # Lifecycle
    # ------------------------------------------------------------------

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile every pooled model's latency + throughput buckets, one
        model at a time (concurrent first compiles would contend the host).

        ``buckets`` forwards to :meth:`InferenceService.warmup`; pass the
        bucket sizes production traffic will actually drive — a bucket first
        reached under load compiles mid-request and lands a multi-second
        p99 outlier on whichever request triggered it (measured:
        docs/serving_bench_r4.jsonl cohost phase before this knob existed).
        """
        for service in self._services.values():
            service.warmup(buckets=buckets)

    def info(self) -> Dict[str, Any]:
        """Pool metadata for ``GET /models``."""
        return {
            "models": {name: svc.info() for name, svc in self._services.items()},
            "default": self.names()[0] if self._services else None,
        }

    def close(self) -> None:
        """Drain and stop every pooled service."""
        for service in self._services.values():
            service.close()

    def __enter__(self) -> "ServicePool":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
