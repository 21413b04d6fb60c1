"""Print the kbmod_tpu version and environment info (kbmod-version)."""

import argparse


def main():
    parser = argparse.ArgumentParser(description="Display kbmod_tpu version information.")
    parser.add_argument("--full", action="store_true", help="Include dependency/device info.")
    args = parser.parse_args()

    import kbmod_tpu

    print(f"kbmod_tpu {kbmod_tpu.__version__}")
    if args.full:
        import jax
        import numpy

        print(f"jax {jax.__version__}")
        print(f"numpy {numpy.__version__}")
        try:
            print(f"devices: {jax.devices()}")
        except Exception as err:  # pragma: no cover
            print(f"devices: unavailable ({err})")


if __name__ == "__main__":
    main()
