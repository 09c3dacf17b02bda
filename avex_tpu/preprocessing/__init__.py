"""Audio preprocessing: activity detection.

The reference reserved this subsystem but never landed it
(``avex/preprocessing/{activity_detector,preprocessor_base}.py`` are 0-LoC
stubs; ``RunConfig.preprocessing`` exists unused, configs.py:801). avex-tpu
ships a working implementation: an energy-based activity detector that scores
frames and selects the most active window — useful for focusing fixed-length
crops on vocalizations instead of silence.
"""

from avex_tpu.preprocessing.activity_detector import (
    ActivityDetector,
    frame_energy,
    select_active_window,
)

__all__ = ["ActivityDetector", "frame_energy", "select_active_window"]
