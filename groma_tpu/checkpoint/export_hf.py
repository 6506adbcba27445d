"""CLI: convert a framework checkpoint to the reference's HF layout.

    python -m groma_tpu.checkpoint.export_hf \
        --ckpt /path/to/framework_ckpt --out groma.safetensors

Loads through checkpoint/loader.load_groma (accepts this framework's
orbax export or an HF directory; ``--ckpt tiny`` exports a random tiny
model for smoke tests), maps the flax tree back to the reference state
dict (checkpoint/hf_export.py, bit-exact inverse of the import), and
writes one .safetensors file any torch/HF consumer can read."""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True,
                    help="framework/HF checkpoint dir (or 'tiny')")
    ap.add_argument('--out', required=True,
                    help='output .safetensors path, or a directory '
                         '(no .safetensors suffix) to write a complete '
                         'HF checkpoint dir: config.json + weights')
    args = ap.parse_args()

    from groma_tpu.checkpoint.hf_export import (export_groma, export_hf_dir,
                                                save_safetensors)
    from groma_tpu.checkpoint.loader import load_groma

    _, params, cfg = load_groma(args.ckpt)
    if not args.out.endswith('.safetensors'):
        export_hf_dir(params, cfg, args.out)
        print(f'wrote HF checkpoint dir {args.out} '
              f'(config.json + model.safetensors)')
        return
    sd = export_groma(params, cfg)
    save_safetensors(sd, args.out)
    n = sum(v.size for v in sd.values())
    print(f'wrote {args.out}: {len(sd)} tensors, {n / 1e6:.1f}M params')


if __name__ == '__main__':
    main()
