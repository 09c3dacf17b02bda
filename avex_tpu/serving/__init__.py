"""Production inference serving (avex-tpu addition; no reference equivalent).

``InferenceService`` micro-batches concurrent requests into power-of-two
bucket shapes so XLA compiles a bounded program set; ``AvexHTTPServer`` puts
a dependency-free HTTP API in front of it. See ``serving/service.py`` for the
design rationale and ``avex-tpu serve`` for the CLI entry point.
"""

from avex_tpu.serving.http import AvexHTTPServer
from avex_tpu.serving.pool import ServicePool
from avex_tpu.serving.service import InferenceService, ServiceConfig

__all__ = ["InferenceService", "ServiceConfig", "AvexHTTPServer", "ServicePool"]
