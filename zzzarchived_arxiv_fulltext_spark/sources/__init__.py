"""Table IO and deterministic fixture generation."""
