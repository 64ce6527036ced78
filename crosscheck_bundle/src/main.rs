//! Cross-check harness: validates a distaff_tpu proof bundle against the
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
