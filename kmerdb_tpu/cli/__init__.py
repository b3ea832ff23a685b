"""CLI surface mirroring the reference's 8 modes (src/params.h:17-36)."""
