from metta_tpu.cogames.main import main

raise SystemExit(main())
