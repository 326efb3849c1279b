"""Generate the committed tiny .sens fixture (tests/fixtures/tiny.sens):
12 synthetic 160x120 RGB-D frames with GT poses, JPEG color + zlib depth —
the real-data wire format exercised end-to-end in CI."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from bundlefusion_tpu.io.synthetic import default_intrinsics, make_sequence
from bundlefusion_tpu.io.sens import encode_frames, save_sens

intr = default_intrinsics(160, 120)
seq = make_sequence(12, intr=intr)
depth = np.asarray(seq["depth"])
color = np.asarray(seq["color"])
data = encode_frames(depth, color, np.asarray(seq["poses"]), intr)
out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "tiny.sens")
save_sens(os.path.abspath(out), data)
print("wrote", os.path.abspath(out))
