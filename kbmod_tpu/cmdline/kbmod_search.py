"""Run a full KBMOD search on a WorkUnit file (kbmod-search).

>>> kbmod-search --workunit=input_wu.fits --outfile=results.ecsv
"""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser(description="Run a KBMOD search from a WorkUnit file.")
    parser.add_argument("--workunit", required=True, help="The input WorkUnit FITS file.")
    parser.add_argument("--outfile", default=None, help="The results output file (.ecsv/.parquet/.hdf5).")
    parser.add_argument("--config", default=None, help="Optional YAML config overriding the WorkUnit's.")
    parser.add_argument("--verbose", action="store_true", help="Enable debug logging.")
    args = parser.parse_args()

    if args.verbose:
        logging.basicConfig(level=logging.DEBUG)

    from kbmod_tpu.configuration import SearchConfiguration
    from kbmod_tpu.run_search import SearchRunner
    from kbmod_tpu.work_unit import WorkUnit

    work = WorkUnit.from_fits(args.workunit)
    if args.config is not None:
        work.config = SearchConfiguration.from_file(args.config)
    if args.outfile is not None:
        work.config.set("result_filename", args.outfile)

    runner = SearchRunner()
    results = runner.run_search_from_work_unit(work)
    print(f"Search produced {len(results)} results.")


if __name__ == "__main__":
    main()
