"""`python -m audio_raytracing_studio_tpu` launches the studio — the same
entry habit as the reference's `python raytracer_studio.py`
(/root/reference/raytracer_studio.py:1387-1397): ensure presets/map assets,
then serve the 4-tab UI on 0.0.0.0:8861 (gradio when installed, else the
framework's stdlib HTTP server)."""

from .app.studio import main

if __name__ == "__main__":
    main()
