"""Host-side utilities: smoothing, camera strategies, video IO, image IO."""
