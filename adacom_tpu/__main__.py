from adacom_tpu.shell import main

raise SystemExit(main())
