#!/usr/bin/env python
"""Load-bench the serving daemon and validate its audio output.

Round-3 verdict: the published serving numbers (21.2 req/s, p95 422 ms)
were measured with random-init weights and no check that responses
decode to real audio.  This script makes the measurement reproducible
and honest: it fires N requests at fixed concurrency against a running
`serve.py`, reports throughput and latency percentiles, and asserts
every response is a well-formed non-silent RIFF wav.

Usage (server first, trained weights):
  python serve.py -p config/LJSpeech10/preprocess.yaml \
      -m config/LJSpeech10/model.yaml -t config/LJSpeech10/train.yaml \
      --weights_npz weights/acoustic_LJSpeech10_100k.npz \
      --vocoder_ckpt weights/vocoder_gen_finetune45k.npz --port 8000 &
  python scripts/serve_bench.py --port 8000 --n 64 --concurrency 8
"""

import argparse
import http.client
import json
import struct
import sys
import threading
import time

TEXTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Secret service agents formed a cordon to keep the press and "
    "photographers from impeding their passage.",
]


def check_wav(body):
    """Return (n_samples, peak) for a RIFF int16 wav, raising on junk."""
    if body[:4] != b"RIFF" or body[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF wav (head {body[:12]!r})")
    i = body.index(b"data")
    n = struct.unpack("<I", body[i + 4:i + 8])[0]
    pcm = body[i + 8:i + 8 + n]
    samples = struct.unpack(f"<{len(pcm) // 2}h", pcm)
    peak = max(abs(s) for s in samples)
    return len(samples), peak


def worker(host, port, texts, out, lock):
    conn = http.client.HTTPConnection(host, port, timeout=120)
    for text in texts:
        t0 = time.time()
        conn.request("POST", "/synthesize",
                     json.dumps({"text": text}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        dt = time.time() - t0
        if resp.status != 200:
            raise SystemExit(f"HTTP {resp.status}: {body[:200]!r}")
        n, peak = check_wav(body)
        if peak < 100:  # int16 scale: digital silence would be ~0
            raise SystemExit(f"near-silent response (peak {peak}) "
                             f"for text: {text!r}")
        with lock:
            out.append((dt, n, peak))
    conn.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args()

    per = [[] for _ in range(args.concurrency)]
    for i in range(args.n):
        per[i % args.concurrency].append(TEXTS[i % len(TEXTS)])

    out, lock = [], threading.Lock()
    # one warm request so compile/warmup doesn't pollute the measurement
    worker(args.host, args.port, TEXTS[:1], [], lock)

    t0 = time.time()
    threads = [threading.Thread(target=worker,
                                args=(args.host, args.port, texts, out, lock))
               for texts in per if texts]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    lat = sorted(d for d, _, _ in out)
    total_samples = sum(n for _, n, _ in out)
    audio_s = total_samples / 22050.0
    result = {
        "n": len(out),
        "concurrency": args.concurrency,
        "throughput_req_s": round(len(out) / wall, 2),
        "audio_realtime_x": round(audio_s / wall, 1),
        "p50_ms": round(lat[len(lat) // 2] * 1000, 1),
        "p95_ms": round(lat[int(len(lat) * 0.95)] * 1000, 1),
        "max_ms": round(lat[-1] * 1000, 1),
        "min_peak_int16": min(p for _, _, p in out),
        "all_nonsilent": True,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
