"""Serve a model over HTTP with TPU micro-batching, then query it.

Offline demo: a small randomly-initialized BEATs encoder behind
``InferenceService`` + ``AvexHTTPServer`` on an ephemeral localhost port.
In production you'd run the CLI instead::

    avex-tpu serve -m esp_aves2_sl_beats_all --port 8000

and POST wav/flac/npy bytes (or JSON ``{"wav": [...], "sr": N}``) to
``/embed``. Concurrent requests coalesce into one device batch; shapes stay
inside a power-of-two bucket set so XLA compiles a bounded program family.
"""

import http.client
import io
import json
import threading

import numpy as np

import avex_tpu
from avex_tpu.configs import ModelSpec
from avex_tpu.serving import AvexHTTPServer, InferenceService, ServiceConfig


def main() -> None:
    spec = ModelSpec(
        name="beats",
        pretrained=False,
        init_config={
            "encoder_layers": 2,
            "encoder_embed_dim": 64,
            "encoder_ffn_embed_dim": 128,
            "encoder_attention_heads": 4,
            "embed_dim": 32,
            "dropout": 0.0,
            "encoder_layerdrop": 0.0,
        },
        audio_config={"representation": "raw", "normalize": False},
    )
    model = avex_tpu.build_model_from_spec(spec)

    config = ServiceConfig(clip_seconds=1.0, max_batch=4, max_wait_ms=50)
    with InferenceService(model, config) as service, AvexHTTPServer(service) as server:
        print(f"serving on http://{server.host}:{server.port}")

        rng = np.random.default_rng(0)
        clips = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(4)]
        outputs = {}

        def post(i: int) -> None:
            conn = http.client.HTTPConnection(server.host, server.port, timeout=300)
            buf = io.BytesIO()
            np.save(buf, clips[i])
            conn.request("POST", "/embed", body=buf.getvalue())
            outputs[i] = json.loads(conn.getresponse().read())
            conn.close()

        # four concurrent clients -> typically ONE bucket-4 device batch
        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i in sorted(outputs):
            print(f"clip {i}: embedding shape {outputs[i]['shape']}")
        stats = service.info()["stats"]
        print(f"requests={stats['requests']} device_batches={stats['batches']} "
              f"buckets={stats['bucket_counts']}")


if __name__ == "__main__":
    main()
