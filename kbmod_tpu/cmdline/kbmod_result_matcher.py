"""Match results against a known-object ephemeris catalog
(kbmod-result-matcher; reference: src/kbmod_cmdline/kbmod_result_matcher.py).

>>> kbmod-result-matcher --input=results.ecsv --catalog=known.ecsv --workunit=wu.fits \
        --outfile=matched.ecsv --sep_thresh=1.0 --time_thresh_s=600
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Match KBMOD results to known objects.")
    parser.add_argument("--input", required=True, help="Input results file.")
    parser.add_argument("--catalog", required=True, help="Known-object catalog (.ecsv/.parquet).")
    parser.add_argument("--workunit", required=True, help="WorkUnit FITS with times and WCS.")
    parser.add_argument("--outfile", required=True, help="Output results file.")
    parser.add_argument("--matcher_name", default="known_objs")
    parser.add_argument("--sep_thresh", type=float, default=1.0, help="Arcsec separation threshold.")
    parser.add_argument("--time_thresh_s", type=float, default=600.0)
    parser.add_argument("--mjd_col", default="mjd_mid")
    parser.add_argument("--ra_col", default="RA")
    parser.add_argument("--dec_col", default="DEC")
    parser.add_argument("--name_col", default="Name")
    parser.add_argument("--remove_matches", action="store_true", help="Drop results matching known objects.")
    args = parser.parse_args()

    import numpy as np

    from kbmod_tpu.filters.known_object_filters import KnownObjsMatcher
    from kbmod_tpu.io import table_io
    from kbmod_tpu.results import Results
    from kbmod_tpu.work_unit import WorkUnit

    results = Results.read_table(args.input)
    catalog = table_io.read_table(args.catalog)
    work = WorkUnit.from_fits(args.workunit)

    if "obs_valid" not in results.colnames and len(results) > 0:
        n_times = work.im_stack.num_times
        results.table["obs_valid"] = np.ones((len(results), n_times), dtype=bool)

    matcher = KnownObjsMatcher(
        catalog,
        np.asarray(work.get_all_obstimes()),
        args.matcher_name,
        sep_thresh=args.sep_thresh,
        time_thresh_s=args.time_thresh_s,
        mjd_col=args.mjd_col,
        ra_col=args.ra_col,
        dec_col=args.dec_col,
        name_col=args.name_col,
    )
    matcher.match(results, work.get_wcs(0))
    matcher.match_on_min_obs(results, 1)
    if args.remove_matches:
        matcher.filter_matches(results, matcher.match_min_obs_col(1))

    results.write_table(args.outfile, overwrite=True)
    print(f"Wrote {len(results)} results to {args.outfile}")


if __name__ == "__main__":
    main()
