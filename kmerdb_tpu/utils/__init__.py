"""Host-side utilities: formatting, filters, logging."""
