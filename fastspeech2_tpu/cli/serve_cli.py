"""CLI for the batched TTS HTTP server (capability superset — the
reference has no serving layer).

Usage:
    python serve.py -p config/LJSpeech/preprocess.yaml \
        -m config/LJSpeech/model.yaml -t config/LJSpeech/train.yaml \
        --restore_step 900000 [--port 8000] [--max_batch_size 16] \
        [--max_wait_ms 20]

Then:  curl -X POST localhost:8000/synthesize \
         -d '{"text": "hello world"}' -o out.wav
"""

import argparse

from fastspeech2_tpu.cli.common import (
    add_config_args,
    dtype_from_flag,
    load_model_for_inference,
    read_configs,
)


def build_server(args):
    configs = read_configs(args)
    preprocess_config, model_config, _ = configs
    model, variables, cfg = load_model_for_inference(
        configs, args.restore_step, args.torch_ckpt,
        dtype_from_flag(args.dtype),
        weights_npz=getattr(args, "weights_npz", None))

    from fastspeech2_tpu.serving import BatchingSynthesizer, TTSServer
    from fastspeech2_tpu.synthesis import Synthesizer, get_vocoder

    vocoder = get_vocoder(model_config, preprocess_config,
                          args.vocoder_ckpt)
    mesh = None
    if args.data_parallel and args.data_parallel > 1:
        from fastspeech2_tpu.parallel import make_mesh

        mesh = make_mesh(data=args.data_parallel, model=1)
    synthesizer = Synthesizer(model, variables, cfg, preprocess_config,
                              vocoder=vocoder, mesh=mesh,
                              snap_to_warm=True)
    batcher = BatchingSynthesizer(
        synthesizer, max_batch_size=args.max_batch_size,
        max_wait_ms=args.max_wait_ms, max_pending=args.max_pending)
    sr = preprocess_config["preprocessing"]["audio"]["sampling_rate"]
    import os as _os

    token = args.auth_token or _os.environ.get("TTS_AUTH_TOKEN") or None
    return TTSServer(batcher, sr, host=args.host, port=args.port,
                     auth_token=token,
                     max_body_bytes=args.max_body_bytes,
                     max_text_len=args.max_text_len)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--restore_step", type=int, default=0)
    add_config_args(parser)
    parser.add_argument("--torch_ckpt", type=str, default=None)
    parser.add_argument("--weights_npz", type=str, default=None,
                        help="tracked fp16 npz snapshot "
                             "(scripts/save_weights_npz.py)")
    parser.add_argument("--vocoder_ckpt", type=str, default=None)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch_size", type=int, default=16)
    parser.add_argument("--max_wait_ms", type=float, default=20.0)
    parser.add_argument("--max_pending", type=int, default=256,
                        help="in-flight request cap; excess is shed "
                             "with HTTP 429")
    parser.add_argument("--auth_token", default=None,
                        help="require 'Authorization: Bearer <token>' "
                             "on POSTs (default: $TTS_AUTH_TOKEN if set)")
    parser.add_argument("--max_body_bytes", type=int, default=65536)
    parser.add_argument("--max_text_len", type=int, default=4096)
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip pre-compiling the batch/text bucket "
                             "executables at startup (first requests then "
                             "pay the compiles)")
    parser.add_argument("--warmup_grid", default="top",
                        choices=["top", "background", "full"],
                        help="beyond the always-compiled top combo: 'top' "
                             "compiles nothing else (requests snap to it "
                             "— safe on shared/relay chips, the default), "
                             "'background' fills the grid in a thread "
                             "(dedicated chip only: in-flight compiles "
                             "serialize ahead of request dispatches), "
                             "'full' fills it blocking before traffic")
    parser.add_argument("--data_parallel", type=int, default=None,
                        help="shard inference batches over an N-device "
                             "data mesh (params replicated); batch "
                             "buckets round up to N")
    args = parser.parse_args(argv)

    server = build_server(args)
    if not args.no_warmup:
        server.batcher.warmup(grid=args.warmup_grid)
    print(f"Serving TTS on {args.host}:{server.port} "
          f"(max_batch_size={args.max_batch_size}, "
          f"max_wait_ms={args.max_wait_ms})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
