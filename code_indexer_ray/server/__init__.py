"""Network serving surface (the reference's daemon/HTTP server analog)."""
