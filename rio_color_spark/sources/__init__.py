"""Sources and sinks: image codec, synthetic generators, storage facade."""
