"""Host-side utility helpers (WAV container IO, resampling, terminal art)."""
