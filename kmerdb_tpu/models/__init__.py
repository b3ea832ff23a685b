"""The database data model: k-mer -> sample-set-pattern tensors."""
