"""Generate an A/B listening page (the reference publishes demo/ +
index.html; this builds the equivalent from local wav pairs).

    python -m fastspeech2_tpu.evaluation.demo_page \
        --out demo_out --title "Copy-synthesis, 26k-step vocoder" \
        gt1.wav:syn1.wav gt2.wav:syn2.wav

Each PAIR is "reference.wav:synthesized.wav"; both files are copied into
--out and an index.html with side-by-side players is written there.
"""

import argparse
import html
import os
import shutil

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; max-width: 56rem; margin: 2rem auto; }}
table {{ border-collapse: collapse; width: 100%; }}
td, th {{ padding: .6rem .8rem; border-bottom: 1px solid #ddd;
          text-align: left; }}
audio {{ width: 16rem; }}
</style></head><body>
<h1>{title}</h1>
<p>{subtitle}</p>
<table>
<tr><th>utterance</th><th>reference</th><th>synthesized</th></tr>
{rows}
</table></body></html>
"""

_ROW = ("<tr><td>{name}</td>"
        '<td><audio controls src="{ref}"></audio></td>'
        '<td><audio controls src="{syn}"></audio></td></tr>')


def write_demo_page(pairs, out_dir, title="Audio demo", subtitle=""):
    """pairs: [(ref_wav_path, syn_wav_path)] -> path of index.html."""
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for idx, (ref, syn) in enumerate(pairs):
        name = os.path.splitext(os.path.basename(ref))[0]
        # index prefix: same-basename pairs from different dirs must not
        # overwrite each other
        ref_dst = f"{idx:02d}_{name}_ref.wav"
        syn_dst = f"{idx:02d}_{name}_syn.wav"
        shutil.copyfile(ref, os.path.join(out_dir, ref_dst))
        shutil.copyfile(syn, os.path.join(out_dir, syn_dst))
        rows.append(_ROW.format(name=html.escape(name), ref=ref_dst,
                                syn=syn_dst))
    path = os.path.join(out_dir, "index.html")
    with open(path, "w") as f:
        f.write(_PAGE.format(title=html.escape(title),
                             subtitle=html.escape(subtitle),
                             rows="\n".join(rows)))
    return path


def _main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("pairs", nargs="+",
                    help='each "reference.wav:synthesized.wav"')
    ap.add_argument("--out", required=True)
    ap.add_argument("--title", default="Audio demo")
    ap.add_argument("--subtitle", default="")
    args = ap.parse_args()
    pairs = [tuple(p.split(":", 1)) for p in args.pairs]
    path = write_demo_page(pairs, args.out, args.title, args.subtitle)
    print(f"Wrote {path} ({len(pairs)} pairs)")


if __name__ == "__main__":
    _main()
