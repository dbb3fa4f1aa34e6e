"""Host-side I/O: wire protocol, PPM codec, calibration JSON, datasets."""
