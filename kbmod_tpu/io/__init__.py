"""IO backends for kbmod_tpu: table serialization (ecsv/parquet/hdf5) and a
self-contained FITS reader/writer (no astropy dependency)."""
