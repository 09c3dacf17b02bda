"""TPU compute ops: fused audio frontends, attention, mask helpers."""

from avex_tpu.ops.audio import (
    frame_mask_to_patch_mask,
    pad_or_window,
    pad_or_window_np,
    sync_crop_or_pad_time,
    waveform_to_frame_mask,
)
from avex_tpu.ops.fbank import KaldiFbank, beats_fbank, eat_fbank
from avex_tpu.ops.frontend import AudioProcessor
