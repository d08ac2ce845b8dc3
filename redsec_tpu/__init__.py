"""redsec-tpu: a TPU-native framework for encrypted (CGGI/TFHE) neural-network inference.

A from-scratch re-design of the capabilities of TrustworthyComputing/REDsec for
TPUs: JAX/XLA/Pallas compute path, int32 torus arithmetic on the VPU/MXU,
batched gate bootstrapping, and `jax.sharding` meshes for multi-chip scale-out.

Subpackages
-----------
- ``formats``  : byte-compatible readers/writers for the reference's on-disk
                 artifacts (``var_prep.dat`` packed weights, image CSVs).
- ``crypto``   : the CGGI/TFHE cryptographic core (LWE/TLWE/TGSW, exact
                 negacyclic NTT, blind rotation, key switching, programmable
                 bootstrapping) built directly in JAX.
- ``models``   : model IR (layer specs), dimension/bit-width inference, and the
                 shipped model zoo (mnist/sign*, mnist/relu*, cifar/*).
- ``runtime``  : executors: plaintext oracle engine and the encrypted engine.
- ``ops``      : encrypted operator library (conv/fc as plaintext-ternary
                 matmuls over ciphertext tensors, pooling, quantize/activations).
- ``parallel`` : device-mesh sharding of bootstrap batches and fan-in psum.
- ``compiler`` : CSV netlist -> model spec / training-script generation.
- ``client``   : keygen / encrypt / decrypt tools.
"""

__version__ = "0.1.0"
