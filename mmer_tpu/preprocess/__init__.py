"""Host-side data prep (decode, face detection) feeding device-side kernels."""
