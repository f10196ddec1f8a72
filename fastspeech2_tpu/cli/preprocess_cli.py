"""`python preprocess.py config/<ds>/preprocess.yaml` and
`python prepare_align.py config/<ds>/preprocess.yaml`
(reference preprocess.py:8-15, prepare_align.py:8-23)."""

import argparse

import yaml


def preprocess_main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str,
                        help="path to preprocess.yaml")
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)
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
