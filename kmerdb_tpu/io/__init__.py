"""Host-side input/output: FASTA ingest, minhash files, database container."""
