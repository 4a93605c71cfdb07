"""astropy shim (read-only FITS; see README.md)."""
