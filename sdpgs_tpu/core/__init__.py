"""Pure-math core: transforms, SH, cameras, Gaussian state pytrees."""
