from super_tpu.render.splat import render_zbuffer, render_soft  # noqa: F401
