{
  # Dev shell for rtgs_tpu (parity with the reference's flake.nix, which
  # provides python + uv and activates a project-local .venv; the Python
  # dependency set itself is pinned by requirements.lock — nixpkgs does
  # not carry TPU-enabled jaxlib, so the venv owns the JAX install).
  description = "TPU-native differentiable ray-traced Gaussian splatting";

  inputs = {
    nixpkgs.url = "github:nixos/nixpkgs/nixos-unstable";
    flake-utils.url = "github:numtide/flake-utils";
  };

  outputs = { self, nixpkgs, flake-utils }:
    flake-utils.lib.eachDefaultSystem (system:
      let
        pkgs = import nixpkgs { inherit system; };
      in
      {
        devShells.default = pkgs.mkShell {
          buildInputs = with pkgs; [
            python312
            uv
            # Native toolchain for the C++ PLY codec (io/plyfast.cpp).
            gcc
            gnumake
          ];
          shellHook = ''
            if [ ! -d .venv ]; then
              uv venv .venv --python ${pkgs.python312}/bin/python
              uv pip sync --python .venv/bin/python requirements.lock
            fi
            source .venv/bin/activate
            export PATH=$PWD/.venv/bin:$PATH
          '';
        };
      });
}
