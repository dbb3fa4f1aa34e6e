"""SLAM model layer: frames, map state, initializer, tracking, mapping,
loop closing, and the System facade."""
