"""`python preprocess.py config/<ds>/preprocess.yaml` and
`python prepare_align.py config/<ds>/preprocess.yaml`
(reference preprocess.py:8-15, prepare_align.py:8-23)."""

import argparse

import yaml


def preprocess_main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str,
                        help="path to preprocess.yaml")
    parser.add_argument("--mfa", action="store_true",
                        help="run Montreal Forced Aligner first (must be "
                             "installed) to produce the TextGrid/ inputs")
    parser.add_argument("--mfa_acoustic_model", default="english_us_arpa")
    parser.add_argument("--mfa_dictionary", default=None)
    parser.add_argument("--align", action="store_true",
                        help="run the in-framework forced aligner first "
                             "(align.py; no external tools) to produce "
                             "the TextGrid/ inputs")
    parser.add_argument("--phones_file", default=None,
                        help="with --align: metadata file supplying "
                             "known phone sequences")
    parser.add_argument("--platform", default=None,
                        help="force a JAX platform (e.g. 'cpu' to keep the "
                             "chip free for a concurrent training run)")
    args = parser.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    if args.align:
        from fastspeech2_tpu.cli.align_cli import align_corpus

        align_corpus(config, phones_file=args.phones_file)
    if args.mfa:
        from fastspeech2_tpu.preprocessing.mfa import run_mfa_align

        out_dir, _ = run_mfa_align(
            config, acoustic_model=args.mfa_acoustic_model,
            dictionary=args.mfa_dictionary)
        print(f"MFA alignment written to {out_dir}")
    from fastspeech2_tpu.preprocessing import Preprocessor

    Preprocessor(config).build_from_path()


def prepare_align_main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str,
                        help="path to preprocess.yaml")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
    from fastspeech2_tpu.preprocessing import PREPARE_ALIGN

    dataset = config["dataset"]
    if dataset not in PREPARE_ALIGN:
        raise SystemExit(
            f"unknown dataset {dataset!r}; supported: "
            f"{sorted(PREPARE_ALIGN)}")
    PREPARE_ALIGN[dataset](config)


if __name__ == "__main__":
    preprocess_main()
