"""Console entry points.

GENIE2_PLATFORM=cpu|tpu forces the jax backend for any CLI in this
package. Needed because plain JAX_PLATFORMS is pre-empted on some images
(a sitecustomize pre-imports jax with a TPU plugin selected); only
jax.config before first backend init wins, and this module is imported
before any CLI touches the backend. Used by validation/drill runs
(tools/flagship_campaign.sh CAMPAIGN_PLATFORM, CPU shape checks).
"""

import os

if os.environ.get("GENIE2_PLATFORM"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["GENIE2_PLATFORM"])
    except Exception:  # backend already initialized: keep whatever it picked
        pass
