"""Migrate legacy results files to the current format
(kbmod-migrate-results; reference: src/kbmod_cmdline/kbmod_migrate_results.py).

Supports legacy whitespace trajectory dumps ('lh: ... x: ...' lines) and
format conversion between .ecsv/.parquet/.hdf5.

>>> kbmod-migrate-results --input=old_results.txt --outfile=results.parquet
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Migrate/convert a KBMOD results file.")
    parser.add_argument("--input", required=True)
    parser.add_argument("--outfile", required=True)
    args = parser.parse_args()

    from kbmod_tpu.results import Results

    if args.input.endswith((".txt", ".dat")):
        results = Results.from_trajectory_file(args.input)
    else:
        results = Results.read_table(args.input)
    results.write_table(args.outfile, overwrite=True)
    print(f"Migrated {len(results)} results {args.input} -> {args.outfile}")


if __name__ == "__main__":
    main()
