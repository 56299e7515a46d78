"""Sources: table IO seam + deterministic synthetic transcripts."""
