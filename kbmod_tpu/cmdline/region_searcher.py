"""Split an ImageCollection into per-patch collections (kbmod-region-search;
reference: src/kbmod_cmdline/region_searcher.py).

>>> kbmod-region-search --ic=survey.ecsv --outdir=patches/ --arcmin=30 --pixel_scale=0.26 \
        --guess_dist=40.0
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="Divide an ImageCollection into sky patches.")
    parser.add_argument("--ic", required=True, help="The ImageCollection .ecsv file.")
    parser.add_argument("--outdir", required=True, help="Output directory for per-patch collections.")
    parser.add_argument("--arcmin", type=float, default=30.0, help="Patch size (arcmin).")
    parser.add_argument("--overlap", type=float, default=0.0, help="Patch overlap percentage.")
    parser.add_argument("--pixel_scale", type=float, required=True, help="Pixel scale (arcsec/px).")
    parser.add_argument("--guess_dist", type=float, default=None, help="Reflex-correction distance (AU).")
    parser.add_argument("--min_images", type=int, default=1, help="Minimum images per exported patch.")
    args = parser.parse_args()

    import numpy as np

    from kbmod_tpu.image_collection import ImageCollection
    from kbmod_tpu.region_search import RegionSearch

    ic = ImageCollection.read(args.ic)
    guess_dists = [args.guess_dist] if args.guess_dist else []
    rs = RegionSearch(ic, guess_dists=guess_dists)

    ra = np.asarray(ic["ra"], dtype=float)
    dec = np.asarray(ic["dec"], dtype=float)
    pad = args.arcmin / 60.0
    rs.generate_patches(
        args.arcmin,
        overlap_percentage=args.overlap,
        pixel_scale=args.pixel_scale,
        ra_range=(ra.min() - pad, ra.max() + pad),
        dec_range=(dec.min() - pad, dec.max() + pad),
    )

    os.makedirs(args.outdir, exist_ok=True)
    matches = rs.match_ic_to_patches(guess_dist=args.guess_dist)
    n_exported = 0
    for patch_id, rows in matches.items():
        if len(rows) < args.min_images:
            continue
        sub = rs.get_image_collection_from_patch(patch_id, guess_dist=args.guess_dist or 0.0)
        sub = rs.export_image_collection(sub, guess_dist=args.guess_dist, patch=patch_id)
        sub.write(os.path.join(args.outdir, f"patch_{patch_id}.ecsv"))
        n_exported += 1
    print(f"Exported {n_exported} patch collections to {args.outdir}")


if __name__ == "__main__":
    main()
