"""Probe system: transfer-learning heads over frozen or fine-tuned backbones."""

from avex_tpu.probes.base import Probe, ProbeNet, ProbePlan, make_probe_plan
from avex_tpu.probes.factory import (
    build_probe_from_config,
    get_probe_class,
    list_probe_classes,
    load_probe_config,
    register_probe_class,
)
