"""Host-side utilities (FLOP counting etc.)."""
