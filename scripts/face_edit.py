"""Texture-editing CLI — arg-compatible with the reference scripts/face_edit.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from e4s_tpu.options.edit_options import EditOptions
    from e4s_tpu.pipelines.face_edit import Editor

    opts = EditOptions().parse()
    editor = Editor(opts)
    res = editor.interpolation()
    os.makedirs(opts.output_dir, exist_ok=True)
    res.save(os.path.join(opts.output_dir, "edit_res.png"))
    print(f"Saved edit result to {opts.output_dir}/edit_res.png")


if __name__ == "__main__":
    main()
