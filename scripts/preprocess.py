"""Raw-corpus preprocessing CLI (ports of preprocessing/*.py)."""

from __future__ import annotations

from _common import base_parser, setup_platform


def main() -> None:
    p = base_parser("Preprocess a raw corpus into frame folders")
    p.add_argument("--out-dir", default="")
    args = p.parse_args()
    setup_platform(args)

    from cvpr23_lfdm_tpu.data import preprocess

    if args.dataset == "mug":
        train, test = preprocess.mug_split(args.data_root, args.seed)
        print("train:", train)
        print("test:", test)
    elif args.dataset == "mhad":
        preprocess.mhad_crop_images(args.data_root, args.out_dir or None)
    elif args.dataset == "natops":
        preprocess.natops_split_videos(args.data_root, args.out_dir or None)


if __name__ == "__main__":
    main()
