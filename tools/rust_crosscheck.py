"""Emit a ready-to-run cross-check bundle against the Rust reference.

This environment has no Rust toolchain, so byte-level compatibility with the
reference (`/root/reference`, GuildOfWeavers/distaff v0.5.1) can only be
*staged* here: this tool produces everything a Rust-equipped machine needs to
validate, in one cargo run, that

  1. our proof bytes deserialize as the reference's bincode `StarkProof`
     (reference src/stark/proof.rs:10, options.rs:97-121),
  2. the unmodified reference `verify()` (src/lib.rs:72) accepts them,
  3. our program hash equals the reference compiler's hash for the same
     assembly source,
  4. our transcript PRNG (utils/rand.py) matches rand 0.7's
     `StdRng::from_seed` + `Uniform` sampling draw-for-draw
     (field.rs:264-275, stark/utils/mod.rs:25-44).

Usage:
    python tools/rust_crosscheck.py [out_dir]      # default: crosscheck_bundle/

Then, on any machine with cargo and the reference checkout:
    cd <out_dir> && cargo run --release -- .
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import distaff_tpu
from distaff_tpu import assembly, ProgramInputs, ProofOptions
from distaff_tpu.math import field
from distaff_tpu.stark import serde
from distaff_tpu.utils.rand import StdRng, UniformU128, usize_iter

SOURCE = "begin repeat.12 swap dup.2 drop add end end"
PUBLIC_INPUTS = [1, 0]
NUM_OUTPUTS = 1

PRNG_SEEDS = [b"\x00" * 32, bytes(range(32)), bytes.fromhex("d9" * 32)]


def prng_vectors():
    """Transcript-PRNG draws a Rust harness can replay verbatim."""
    out = []
    for seed in PRNG_SEEDS:
        rng = StdRng(seed)
        dist = UniformU128(0, field.M)
        field_draws = [dist.sample(rng) for _ in range(8)]
        pos_pow2 = [next(it) for it in [usize_iter(seed, 1 << 13)] for _ in range(8)]
        pos_odd = [next(it) for it in [usize_iter(seed, 1000)] for _ in range(8)]
        out.append({
            "seed_hex": seed.hex(),
            # field::prng_vector(seed)[0..8] with modulus M
            "field_draws": [str(v) for v in field_draws],
            # Uniform::from(0usize..8192).sample x8 (query-position path)
            "usize_draws_bound_8192": pos_pow2,
            # Uniform::from(0usize..1000).sample x8 (exercises the rejection zone)
            "usize_draws_bound_1000": pos_odd,
        })
    return out


MAIN_RS = r'''//! Cross-check harness: validates a distaff_tpu proof bundle against the
//! unmodified reference implementation.  Build with the reference crate as a
//! path dependency (see Cargo.toml).

use std::fs;
use std::path::Path;

use distaff::{ self, ProgramInputs, StarkProof };
use rand::distributions::{ Distribution, Uniform };
use rand::SeedableRng;
use rand::rngs::StdRng;

fn main() {
    let dir = std::env::args().nth(1).unwrap_or_else(|| ".".to_string());
    let dir = Path::new(&dir);
    let fixture: serde_json::Value =
        serde_json::from_str(&fs::read_to_string(dir.join("fixture.json")).unwrap()).unwrap();

    // 1. program hash parity
    let program = distaff::assembly::compile(fixture["source"].as_str().unwrap()).unwrap();
    let expected_hash = fixture["program_hash_hex"].as_str().unwrap();
    assert_eq!(hex::encode(program.hash()), expected_hash, "program hash mismatch");
    println!("program hash OK: {}", expected_hash);

    // 2. + 3. proof bytes deserialize and verify
    let proof_bytes = fs::read(dir.join("proof.bin")).unwrap();
    let proof: StarkProof = bincode::deserialize(&proof_bytes).unwrap();
    let inputs: Vec<u128> = fixture["public_inputs"].as_array().unwrap()
        .iter().map(|v| v.as_str().unwrap().parse().unwrap()).collect();
    let outputs: Vec<u128> = fixture["outputs"].as_array().unwrap()
        .iter().map(|v| v.as_str().unwrap().parse().unwrap()).collect();
    match distaff::verify(program.hash(), &inputs, &outputs, &proof) {
        Ok(_) => println!("reference verify() accepted the proof"),
        Err(e) => panic!("reference verify() REJECTED the proof: {}", e),
    }

    // round-trip: re-serialization must reproduce our bytes exactly
    let reser = bincode::serialize(&proof).unwrap();
    assert_eq!(reser, proof_bytes, "bincode round-trip bytes differ");
    println!("bincode round-trip OK ({} bytes)", proof_bytes.len());

    // 4. transcript PRNG draw-for-draw
    for vec in fixture["prng"].as_array().unwrap() {
        let seed_hex = vec["seed_hex"].as_str().unwrap();
        let mut seed = [0u8; 32];
        hex::decode_to_slice(seed_hex, &mut seed).unwrap();

        let mut rng = StdRng::from_seed(seed);
        let dist = Uniform::from(0..distaff::math::field::M);
        for (i, expected) in vec["field_draws"].as_array().unwrap().iter().enumerate() {
            let v: u128 = dist.sample(&mut rng);
            assert_eq!(v.to_string(), expected.as_str().unwrap(),
                       "field draw {} mismatch for seed {}", i, seed_hex);
        }
        // query-position sampling path: Uniform::from(0..bound) on usize
        // (reference stark/utils/mod.rs:26-27) - NOT gen_range, whose
        // sample_single zone differs in rand 0.7
        let mut rng = StdRng::from_seed(seed);
        let dist = Uniform::from(0usize..8192);
        for (i, expected) in vec["usize_draws_bound_8192"].as_array().unwrap().iter().enumerate() {
            let v: usize = dist.sample(&mut rng);
            assert_eq!(v as u64, expected.as_u64().unwrap(),
                       "usize(8192) draw {} mismatch for seed {}", i, seed_hex);
        }
        let mut rng = StdRng::from_seed(seed);
        let dist = Uniform::from(0usize..1000);
        for (i, expected) in vec["usize_draws_bound_1000"].as_array().unwrap().iter().enumerate() {
            let v: usize = dist.sample(&mut rng);
            assert_eq!(v as u64, expected.as_u64().unwrap(),
                       "usize(1000) draw {} mismatch for seed {}", i, seed_hex);
        }
        println!("PRNG draws OK for seed {}", seed_hex);
    }

    println!("ALL CROSS-CHECKS PASSED");
}
'''

CARGO_TOML = '''[package]
name = "distaff-crosscheck"
version = "0.1.0"
edition = "2018"

[dependencies]
# Point this at a checkout of GuildOfWeavers/distaff v0.5.1
# (git clone https://github.com/GuildOfWeavers/distaff && git checkout v0.5.1)
distaff = { path = "../distaff" }
bincode = "1.2"
serde_json = "1.0"
rand = "0.7.3"
hex = "0.4"
'''

BUNDLE_README = '''# distaff_tpu -> Rust reference cross-check bundle

Generated by tools/rust_crosscheck.py on a machine WITHOUT a Rust toolchain.
To validate on a Rust-equipped machine:

    git clone https://github.com/GuildOfWeavers/distaff ../distaff
    (cd ../distaff && git checkout v0.5.1)
    cargo run --release -- .

The harness asserts, against the UNMODIFIED reference crate:
  1. `assembly::compile(source).hash()` equals our program hash,
  2. `bincode::deserialize::<StarkProof>` accepts proof.bin and
     `distaff::verify()` accepts the proof,
  3. re-serialization reproduces proof.bin byte-for-byte,
  4. StdRng/Uniform transcript draws match ours draw-for-draw
     (3 seeds x {field x8, usize(8192) x8, usize(1000) x8}).

Note: the reference exports `math::field` privately in v0.5.1; if
`distaff::math::field::M` is not visible, replace it with the literal
340282366920938463463374607393113505793 (= 2^128 - 45*2^40 + 1) in main.rs.

Contents: fixture.json (claims + PRNG vectors), proof.bin (bincode proof
bytes), src/main.rs, Cargo.toml.
'''


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "crosscheck_bundle")
    os.makedirs(os.path.join(out_dir, "src"), exist_ok=True)

    program = assembly.compile(SOURCE)
    inputs = ProgramInputs.from_public(PUBLIC_INPUTS)
    options = ProofOptions()  # default 32/50/20/blake3: the serializable config
    t0 = time.time()
    outputs, proof = distaff_tpu.execute(program, inputs, NUM_OUTPUTS, options)
    assert distaff_tpu.verify(
        program.hash, inputs.get_public_inputs(), outputs, proof)
    blob = serde.serialize(proof)
    print(f"proved + verified + serialized in {time.time() - t0:.1f}s "
          f"({len(blob)} proof bytes)")

    fixture = {
        "source": SOURCE,
        "program_hash_hex": program.hash.hex(),
        "public_inputs": [str(v) for v in inputs.get_public_inputs()],
        "outputs": [str(v) for v in outputs],
        "options": {"extension_factor": options.extension_factor(),
                    "num_queries": options.num_queries(),
                    "grinding_factor": options.grinding_factor(),
                    "hash_fn": options.hash_fn},
        "trace_root_hex": proof.trace_root.hex(),
        "constraint_root_hex": proof.constraint_root.hex(),
        "pow_nonce": proof.pow_nonce,
        "prng": prng_vectors(),
    }

    with open(os.path.join(out_dir, "fixture.json"), "w") as fh:
        json.dump(fixture, fh, indent=2)
    with open(os.path.join(out_dir, "proof.bin"), "wb") as fh:
        fh.write(blob)
    with open(os.path.join(out_dir, "src", "main.rs"), "w") as fh:
        fh.write(MAIN_RS)
    with open(os.path.join(out_dir, "Cargo.toml"), "w") as fh:
        fh.write(CARGO_TOML)
    with open(os.path.join(out_dir, "README.md"), "w") as fh:
        fh.write(BUNDLE_README)
    print(f"bundle written to {out_dir}/")


if __name__ == "__main__":
    main()
