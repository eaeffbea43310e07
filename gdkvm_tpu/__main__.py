from gdkvm_tpu.cli import main

raise SystemExit(main())
