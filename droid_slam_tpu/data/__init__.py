"""Dataset streams and training data: TUM / EuRoC / ETH3D / TartanAir."""
