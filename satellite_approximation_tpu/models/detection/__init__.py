"""Cloud & cloud-shadow detection for Sentinel-2 (Layton et al., MDPI Remote
Sensing 15(16):3955) — the TPU-native rebuild of lib/cloud_shadow_detection."""
