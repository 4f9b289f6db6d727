"""Neural models: LPIPS (VGG16), monocular-depth estimators."""
